"""Sparse message passing: SpMM / SDDMM over padded COO edge lists.

The hot loop of every encoder (the reference's per-layer `GCNConv`/`GINConv`
SpMM, `scripts/node_shared.py:242-247`, `scripts/graph_shared.py:119-130`)
expressed as gather -> scale -> segment-sum, which XLA lowers to sorted
scatter-adds on TPU. Feature matrices stay [N, F] with F a lane-friendly
multiple of 128 wherever possible so the surrounding matmuls hit the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rlap_tpu.core.graph import Graph


def spmm(g: Graph, x: jax.Array, edge_weights: Optional[jax.Array] = None,
         indices_are_sorted: bool = False, mesh=None,
         axis: str = "data") -> jax.Array:
    """out[i] = sum over edges (j -> i) of w_e * x[j].   x: [N, F] -> [N, F].

    Padding edges (sender == num_nodes) contribute to the dropped sentinel
    row. When `mesh` is given, dispatches to the edge-partitioned shard_map
    SpMM (`parallel/spmm.py`): each shard segment-sums its local edge slice
    and ONE psum over the mesh axis combines partials over ICI.
    """
    if mesh is not None:
        from rlap_tpu.parallel.spmm import spmm_edge_partitioned

        return spmm_edge_partitioned(g, x, mesh, axis=axis,
                                     edge_weights=edge_weights)
    w = g.weights if edge_weights is None else edge_weights
    n = g.num_nodes
    # gather source features; sentinel index n reads row n of the padded x
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    msgs = xp[g.senders] * w[:, None].astype(x.dtype)
    out = jax.ops.segment_sum(
        msgs, g.receivers, num_segments=n + 1,
        indices_are_sorted=indices_are_sorted)
    return out[:n]


def sddmm(g: Graph, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-edge dot products: out_e = <a[sender_e], b[receiver_e]>."""
    ap = jnp.concatenate([a, jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
    bp = jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)], axis=0)
    return jnp.sum(ap[g.senders] * bp[g.receivers], axis=-1)


def gcn_norm(g: Graph, add_self_loops: bool = True,
             improved: bool = False) -> tuple:
    """Symmetric GCN normalization (norm='both'): w_e / sqrt(d_i d_j).

    Matches PyG `GCNConv`'s default / DGL `GraphConv(norm='both')` semantics
    used by every reference encoder (`node_shared.py:233-247`,
    `CCA-SSG/model.py:38-67`). Self-loops are appended (capacity grows by
    num_nodes) and included in the degree, as PyG does.

    Returns (graph_with_loops, normalized_edge_weights).
    """
    from rlap_tpu.core import graph as G

    if add_self_loops:
        g = G.remove_self_loops(g)
        g = G.add_self_loops(g, weight=2.0 if improved else 1.0)
    deg = jax.ops.segment_sum(
        g.weights, g.senders, num_segments=g.num_nodes + 1)[:-1]
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    dpad = jnp.concatenate([dinv, jnp.zeros((1,), dinv.dtype)])
    wn = g.weights * dpad[g.senders] * dpad[g.receivers]
    return g, wn
