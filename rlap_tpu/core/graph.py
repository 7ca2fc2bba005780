"""Padded-COO graph container and static-shape edge-list algebra.

This is the TPU-native replacement for the reference's sparse structures
(`rlap/csrc/types.h:53-68` linked-list `PriorityMatrix`, Eigen CSC built by
`rlap/csrc/reader.cc:42-61`): instead of pointer-chased columns, a graph is a
flat COO edge list padded to a **static capacity** `edge_capacity`, so every
operation on it is jittable and maps onto the VPU/MXU.

Conventions
-----------
* Padding edges have ``senders == receivers == num_nodes`` (a sentinel node)
  and ``weights == 0``. Segment reductions therefore use
  ``num_segments = num_nodes + 1`` and drop the last row.
* Graphs are *directed* at the storage level; an undirected graph stores both
  ``(u, v)`` and ``(v, u)`` (the reference keeps symmetric adjacency the same
  way, `rlap/csrc/factorizers.cc:18-40`).
* ``num_nodes`` is static (part of the pytree treedef); real-vs-padded node
  ids are tracked with ``node_mask`` when a graph is node-padded (batching).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class Graph:
    """A padded COO graph. All fields jittable; `num_nodes` is static."""

    senders: jax.Array  # int32[edge_capacity]
    receivers: jax.Array  # int32[edge_capacity]
    weights: jax.Array  # float[edge_capacity]
    num_nodes: int = struct.field(pytree_node=False)
    x: Optional[jax.Array] = None  # [num_nodes, F] node features
    node_mask: Optional[jax.Array] = None  # bool[num_nodes]

    # ---- basic properties -------------------------------------------------

    @property
    def edge_capacity(self) -> int:
        return self.senders.shape[0]

    @property
    def edge_mask(self) -> jax.Array:
        return self.senders < self.num_nodes

    @property
    def num_edges(self) -> jax.Array:
        """Number of live (non-padding) edges. Traced value."""
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    @property
    def num_real_nodes(self) -> jax.Array:
        if self.node_mask is None:
            return jnp.asarray(self.num_nodes, jnp.int32)
        return jnp.sum(self.node_mask.astype(jnp.int32))

    # (`.replace(**kw)` is provided by flax.struct.dataclass)

    # ---- constructors -----------------------------------------------------

    @staticmethod
    def from_edges(
        senders,
        receivers,
        num_nodes: int,
        weights=None,
        x=None,
        edge_capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "Graph":
        """Build from (possibly numpy) edge arrays, padding to capacity."""
        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        e = senders.shape[0]
        if weights is None:
            weights = np.ones((e,), dtype=np.float64)
        weights = np.asarray(weights)
        cap = edge_capacity or max(_round_up(max(e, 1), 128), 128)
        if e > cap:
            raise ValueError(f"edge_capacity {cap} < num edges {e}")
        s = np.full((cap,), num_nodes, np.int32)
        r = np.full((cap,), num_nodes, np.int32)
        w = np.zeros((cap,), np.float64)
        s[:e] = senders
        r[:e] = receivers
        w[:e] = weights
        return Graph(
            senders=jnp.asarray(s),
            receivers=jnp.asarray(r),
            weights=jnp.asarray(w, dtype=dtype),
            num_nodes=int(num_nodes),
            x=None if x is None else jnp.asarray(x),
            node_mask=None,
        )


# ---------------------------------------------------------------------------
# static-shape edge-list algebra
# ---------------------------------------------------------------------------


def sort_edges(g: Graph) -> Graph:
    """Sort edges by (sender, receiver); padding goes to the tail.

    Uses a two-key lexsort (no fused int64 key) so node counts above
    sqrt(2^31) stay exact with int32 on TPU.
    """
    order = jnp.lexsort((g.receivers, g.senders))
    return g.replace(
        senders=g.senders[order],
        receivers=g.receivers[order],
        weights=g.weights[order],
    )


def coalesce(g: Graph, sort: bool = True, reduce: str = "sum") -> Graph:
    """Merge duplicate (sender, receiver) pairs by combining weights.

    Static-shape analogue of the reference's `compressColumn` merge
    (`rlap/csrc/preconditioner.cc:641-676`), applied globally. Output is
    sorted by (sender, receiver) with padding at the tail.
    `reduce`: "sum" (default, torch_sparse.coalesce semantics) or "max"
    (idempotent; used by `to_undirected` on possibly-symmetric inputs).
    """
    if sort:
        g = sort_edges(g)
    head = jnp.concatenate([
        jnp.ones((1,), bool),
        (g.senders[1:] != g.senders[:-1]) | (g.receivers[1:] != g.receivers[:-1]),
    ])
    # position of each edge's group head in the compacted list
    pos = jnp.cumsum(head.astype(jnp.int32)) - 1
    cap = g.edge_capacity
    if reduce == "sum":
        wsum = jnp.zeros((cap,), g.weights.dtype).at[pos].add(g.weights)
    elif reduce == "max":
        wsum = jnp.zeros((cap,), g.weights.dtype).at[pos].max(g.weights)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    # gather the (s, r) of each group head into the compacted slots
    snew = jnp.full((cap,), g.num_nodes, g.senders.dtype).at[pos].min(g.senders)
    rnew = jnp.full((cap,), g.num_nodes, g.receivers.dtype).at[pos].min(g.receivers)
    # kill compacted slots that only contain padding
    live = snew < g.num_nodes
    snew = jnp.where(live, snew, g.num_nodes)
    rnew = jnp.where(live, rnew, g.num_nodes)
    wsum = jnp.where(live, wsum, 0.0)
    return g.replace(senders=snew, receivers=rnew, weights=wsum)


def coalesce_fast(g: Graph) -> Graph:
    """Merge duplicate (sender, receiver) pairs IN PLACE: one fused-key sort
    + a segmented scan; the tail of each duplicate run keeps the sum and the
    rest become padding. Unlike `coalesce` there is no compaction scatter,
    so merged-away slots sit where they fell (still marked padding) — use
    when edge ORDER doesn't matter (segment reductions, the elimination
    kernel's entry/exit). Requires n*(n+2) < 2^31; falls back to `coalesce`
    otherwise."""
    n = g.num_nodes
    if n * (n + 2) >= np.iinfo(np.int32).max:
        return coalesce(g)
    B = n + 1
    kappa = g.senders * B + g.receivers
    kappa, w = jax.lax.sort((kappa, g.weights), num_keys=1)
    same = kappa[1:] == kappa[:-1]
    head = jnp.concatenate([jnp.ones((1,), bool), jnp.logical_not(same)])
    tail = jnp.concatenate([jnp.logical_not(same), jnp.ones((1,), bool)])

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    wsum, _ = jax.lax.associative_scan(combine, (w, head))
    keep = tail & (kappa < n * B)
    s = jnp.where(keep, kappa // B, n)
    return g.replace(
        senders=s,
        receivers=jnp.where(keep, kappa - s * B, n),
        weights=jnp.where(keep, wsum, jnp.zeros((), g.weights.dtype)),
    )


def drop_zero_weight(g: Graph) -> Graph:
    """Turn zero-weight live edges into padding (keeps sorted-ness modulo tail).

    Mirrors the reference reader's zero-entry drop (`rlap/csrc/reader.cc:50-55`).
    """
    dead = (g.weights == 0) & g.edge_mask
    return g.replace(
        senders=jnp.where(dead, g.num_nodes, g.senders),
        receivers=jnp.where(dead, g.num_nodes, g.receivers),
        weights=jnp.where(dead, 0.0, g.weights),
    )


def to_undirected(g: Graph, reduce: str = "max") -> Graph:
    """Symmetrize: output holds both directions of every live edge, coalesced.

    With the default `reduce="max"` an already-symmetric graph is a fixed
    point (duplicated directions collapse to the original weight). Capacity
    doubles statically.
    """
    s = jnp.concatenate([g.senders, g.receivers])
    r = jnp.concatenate([g.receivers, g.senders])
    w = jnp.concatenate([g.weights, g.weights])
    big = Graph(senders=s, receivers=r, weights=w, num_nodes=g.num_nodes, x=g.x,
                node_mask=g.node_mask)
    return coalesce(big, reduce=reduce)


def remove_self_loops(g: Graph) -> Graph:
    loop = (g.senders == g.receivers) & g.edge_mask
    return g.replace(
        senders=jnp.where(loop, g.num_nodes, g.senders),
        receivers=jnp.where(loop, g.num_nodes, g.receivers),
        weights=jnp.where(loop, 0.0, g.weights),
    )


def add_self_loops(g: Graph, weight: float = 1.0) -> Graph:
    """Append one self-loop per (real) node. Grows capacity by num_nodes."""
    n = g.num_nodes
    loop_ids = jnp.arange(n, dtype=g.senders.dtype)
    if g.node_mask is not None:
        loop_ids = jnp.where(g.node_mask, loop_ids, n)
    lw = jnp.where(loop_ids < n, jnp.asarray(weight, g.weights.dtype), 0.0)
    return g.replace(
        senders=jnp.concatenate([g.senders, loop_ids]),
        receivers=jnp.concatenate([g.receivers, loop_ids]),
        weights=jnp.concatenate([g.weights, lw]),
    )


def degrees(g: Graph) -> jax.Array:
    """Unweighted out-degree (= degree for symmetric graphs). float[n]."""
    ones = g.edge_mask.astype(g.weights.dtype)
    return jax.ops.segment_sum(ones, g.senders, num_segments=g.num_nodes + 1)[:-1]


def weighted_degrees(g: Graph) -> jax.Array:
    return jax.ops.segment_sum(
        g.weights, g.senders, num_segments=g.num_nodes + 1
    )[:-1]


def induced_subgraph(g: Graph, keep: jax.Array) -> Graph:
    """Kill edges with either endpoint outside `keep` (bool[num_nodes]).
    Node ids are preserved (no relabeling) — padded-static-shape analogue of
    PyG `subgraph(...)` as used by the diffusion augmentors."""
    kp = jnp.concatenate([keep, jnp.zeros((1,), bool)])
    alive = g.edge_mask & kp[g.senders] & kp[g.receivers]
    return g.replace(
        senders=jnp.where(alive, g.senders, g.num_nodes),
        receivers=jnp.where(alive, g.receivers, g.num_nodes),
        weights=jnp.where(alive, g.weights, 0.0),
    )


def mirror_indices(g: Graph) -> jax.Array:
    """For a symmetric, coalesced, (s, r)-sorted edge list: index of each
    edge's reversed twin. (Sorting by (r, s) lists mirrors in order.)"""
    return jnp.lexsort((g.senders, g.receivers)).astype(jnp.int32)


def with_capacity(g: Graph, edge_capacity: int) -> Graph:
    """Grow (or shrink, host-side only) the static edge capacity."""
    cap = g.edge_capacity
    if edge_capacity == cap:
        return g
    if edge_capacity > cap:
        pad = edge_capacity - cap
        return g.replace(
            senders=jnp.concatenate(
                [g.senders, jnp.full((pad,), g.num_nodes, g.senders.dtype)]),
            receivers=jnp.concatenate(
                [g.receivers, jnp.full((pad,), g.num_nodes, g.receivers.dtype)]),
            weights=jnp.concatenate(
                [g.weights, jnp.zeros((pad,), g.weights.dtype)]),
        )
    # shrinking: caller must guarantee the tail is padding (host-side check)
    g = sort_edges(g)
    return g.replace(
        senders=g.senders[:edge_capacity],
        receivers=g.receivers[:edge_capacity],
        weights=g.weights[:edge_capacity],
    )


# ---------------------------------------------------------------------------
# batching (block-diagonal disjoint union) — the GraphCL per-batch pattern
# (`scripts/graph_shared.py:152-169` loops a DataLoader of 128-graph unions)
# ---------------------------------------------------------------------------


def block_diagonal(graphs: list, node_capacity: int, edge_capacity: int,
                   feature_dim: Optional[int] = None) -> tuple:
    """Host-side disjoint union of `graphs` into one padded Graph.

    Returns (graph, segment_ids) where segment_ids: int32[node_capacity] maps
    each node to its source-graph index (padding nodes map to len(graphs)).
    """
    ss, rr, ww, xs, seg = [], [], [], [], []
    off = 0
    for gi, g in enumerate(graphs):
        m = np.asarray(g.edge_mask)
        s = np.asarray(g.senders)[m] + off
        r = np.asarray(g.receivers)[m] + off
        w = np.asarray(g.weights)[m]
        ss.append(s); rr.append(r); ww.append(w)
        if g.x is not None:
            xs.append(np.asarray(g.x))
        seg.append(np.full((g.num_nodes,), gi, np.int32))
        off += g.num_nodes
    if off > node_capacity:
        raise ValueError(f"node_capacity {node_capacity} < total nodes {off}")
    s = np.concatenate(ss) if ss else np.zeros((0,), np.int32)
    r = np.concatenate(rr) if rr else np.zeros((0,), np.int32)
    w = np.concatenate(ww) if ww else np.zeros((0,), np.float64)
    if s.shape[0] > edge_capacity:
        raise ValueError(f"edge_capacity {edge_capacity} < total edges {s.shape[0]}")
    seg_ids = np.full((node_capacity,), len(graphs), np.int32)
    seg_ids[:off] = np.concatenate(seg)
    node_mask = np.zeros((node_capacity,), bool)
    node_mask[:off] = True
    x = None
    if xs:
        f = xs[0].shape[1]
        x = np.zeros((node_capacity, f), xs[0].dtype)
        x[:off] = np.concatenate(xs, axis=0)
    elif feature_dim is not None:
        # featureless fallback: x = ones (graph_shared.py:156-160)
        x = np.zeros((node_capacity, feature_dim), np.float32)
        x[:off] = 1.0
    g = Graph.from_edges(s, r, num_nodes=node_capacity, weights=w,
                         edge_capacity=edge_capacity)
    g = g.replace(x=None if x is None else jnp.asarray(x),
                  node_mask=jnp.asarray(node_mask))
    return g, jnp.asarray(seg_ids)


# ---------------------------------------------------------------------------
# dense conversion (tests / spectral analysis only)
# ---------------------------------------------------------------------------


def to_dense(g: Graph) -> jax.Array:
    n = g.num_nodes
    a = jnp.zeros((n + 1, n + 1), g.weights.dtype)
    a = a.at[g.senders, g.receivers].add(g.weights)
    return a[:n, :n]


def laplacian_dense(g: Graph) -> jax.Array:
    """L = D - A (the reference's `computeLaplacian`, factorizers.cc:18-40)."""
    a = to_dense(g)
    return jnp.diag(jnp.sum(a, axis=1)) - a
