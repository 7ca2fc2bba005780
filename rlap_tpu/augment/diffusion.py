"""Graph diffusion augmentors: PPR and Markov diffusion.

Reference semantics (PyGCL `A.PPRDiffusion` / `A.MarkovDiffusion` used at
`node_shared.py:475-486`; `compute_ppr` consumed by `rLapPPRDiffusion`,
`augmentor_benchmarks.py:157-164`): personalized-PageRank matrix
  S = alpha (I - (1-alpha) T)^{-1},  T = D^{-1/2} A D^{-1/2},
sparsified by threshold eps. TPU-native realization: the Neumann series as a
fixed-depth power iteration of dense matmuls (pure MXU work; K=32 gives
(1-alpha)^32 < 1e-3 tail for alpha=0.2), then a per-row top-k sparsification
into a static edge budget instead of a dynamic eps filter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor, CachedAugmentor
from rlap_tpu.augment.rlap import RLap
from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph


def _sym_norm_dense(g: Graph, add_self_loop: bool = True) -> jax.Array:
    a = G.to_dense(g)
    if add_self_loop:
        a = a + jnp.eye(g.num_nodes, dtype=a.dtype)
    deg = a.sum(axis=1)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return a * dinv[:, None] * dinv[None, :]


def compute_ppr_dense(g: Graph, alpha: float = 0.2, iters: int = 32,
                      add_self_loop: bool = True) -> jax.Array:
    """S = alpha * sum_k ((1-alpha) T)^k via S <- alpha I + (1-alpha) T S."""
    t = _sym_norm_dense(g, add_self_loop)
    n = g.num_nodes
    eye = jnp.eye(n, dtype=t.dtype)

    def body(_, s):
        return alpha * eye + (1 - alpha) * (t @ s)

    return jax.lax.fori_loop(0, iters, body, alpha * eye)


def compute_markov_dense(g: Graph, alpha: float = 0.05, order: int = 16,
                         add_self_loop: bool = True) -> jax.Array:
    """Markov diffusion kernel: average of the first `order` powers of the
    lazy walk  W = alpha I + (1-alpha) T  (PyGCL compute_markov_diffusion)."""
    t = _sym_norm_dense(g, add_self_loop)
    n = g.num_nodes
    eye = jnp.eye(n, dtype=t.dtype)
    w = alpha * eye + (1 - alpha) * t

    def body(_, carry):
        p, acc = carry
        p = w @ p
        return p, acc + p

    _, acc = jax.lax.fori_loop(0, order, body, (eye, jnp.zeros_like(eye)))
    return acc / order


def dense_to_graph(s: jax.Array, g: Graph, eps: float = 1e-4,
                   edge_capacity: Optional[int] = None) -> Graph:
    """Sparsify a dense diffusion matrix into a padded Graph: per-row top-k
    (k = capacity // n) intersected with the eps threshold — the
    static-shape analogue of PyGCL's `sparsify with eps`."""
    n = g.num_nodes
    cap = edge_capacity or g.edge_capacity
    k = max(min(cap // n, n), 1)
    vals, idx = jax.lax.top_k(s, k)  # [n, k]
    senders = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                               (n, k)).reshape(-1)
    receivers = idx.astype(jnp.int32).reshape(-1)
    weights = vals.reshape(-1).astype(g.weights.dtype)
    live = weights >= eps
    if g.node_mask is not None:
        nm = g.node_mask
        live = live & nm[senders] & nm[receivers]
    senders = jnp.where(live, senders, n)
    receivers = jnp.where(live, receivers, n)
    weights = jnp.where(live, weights, 0.0)
    pad = cap - n * k
    if pad < 0:
        senders, receivers, weights = (senders[:cap], receivers[:cap],
                                       weights[:cap])
    elif pad > 0:
        senders = jnp.concatenate([senders, jnp.full((pad,), n, jnp.int32)])
        receivers = jnp.concatenate([receivers, jnp.full((pad,), n, jnp.int32)])
        weights = jnp.concatenate([weights, jnp.zeros((pad,), weights.dtype)])
    out = Graph(senders=senders, receivers=receivers, weights=weights,
                num_nodes=n, x=g.x, node_mask=g.node_mask)
    return G.sort_edges(out)


def ppr_diffusion_graph(g: Graph, alpha: float = 0.2, eps: float = 1e-4,
                        iters: int = 32, add_self_loop: bool = True,
                        edge_capacity: Optional[int] = None) -> Graph:
    s = compute_ppr_dense(g, alpha=alpha, iters=iters,
                          add_self_loop=add_self_loop)
    return dense_to_graph(s, g, eps=eps, edge_capacity=edge_capacity)


class PPRDiffusion(Augmentor):
    def __init__(self, alpha: float = 0.2, eps: float = 1e-4,
                 iters: int = 32, add_self_loop: bool = True,
                 edge_capacity: Optional[int] = None):
        self.alpha, self.eps = alpha, eps
        self.iters, self.add_self_loop = iters, add_self_loop
        self.edge_capacity = edge_capacity

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        return ppr_diffusion_graph(g, self.alpha, self.eps, self.iters,
                                   self.add_self_loop, self.edge_capacity)


class MarkovDiffusion(Augmentor):
    def __init__(self, alpha: float = 0.05, order: int = 16,
                 eps: float = 1e-4, add_self_loop: bool = True,
                 edge_capacity: Optional[int] = None):
        self.alpha, self.order, self.eps = alpha, order, eps
        self.add_self_loop = add_self_loop
        self.edge_capacity = edge_capacity

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        s = compute_markov_dense(g, self.alpha, self.order,
                                 self.add_self_loop)
        return dense_to_graph(s, g, eps=self.eps,
                              edge_capacity=self.edge_capacity)


class PPRDiffusionSubGraph(Augmentor):
    """PPR then restriction to a random <=sub_graph_size node subset
    (`augmentor_benchmarks.py:174-213`). Node ids are preserved (masked, not
    relabeled) so downstream encoders keep static shapes."""

    def __init__(self, alpha: float = 0.2, eps: float = 1e-4,
                 add_self_loop: bool = True, sub_graph_size: int = 8192,
                 iters: int = 32):
        self.alpha, self.eps = alpha, eps
        self.add_self_loop = add_self_loop
        self.sub_graph_size = sub_graph_size
        self.iters = iters

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        out = ppr_diffusion_graph(g, self.alpha, self.eps, self.iters,
                                  self.add_self_loop)
        n = g.num_nodes
        if n <= self.sub_graph_size:
            return out
        perm = jax.random.permutation(key, n)
        keep = jnp.zeros((n,), bool).at[perm[: self.sub_graph_size]].set(True)
        return G.induced_subgraph(out, keep)


class RLapPPRDiffusion(Augmentor):
    """rLap -> PPR diffusion on the (weighted) Schur complement
    (`augmentor_benchmarks.py:99-171`): 'diffusion after subsampling
    approximates subsampling after diffusion'. The reference relabels the
    survivor subgraph before dense PPR; eliminated nodes here are simply
    isolated rows of T (zero mass), so no relabeling is needed.
    Wrap in `CachedAugmentor` for the reference's refresh_cache_freq=50."""

    def __init__(self, frac: float, o_v: str = "random", o_n: str = "asc",
                 alpha: float = 0.2, eps: float = 1e-4, iters: int = 32):
        self.rlap = RLap(frac, o_v=o_v, o_n=o_n, keep_weights=True)
        self.alpha, self.eps, self.iters = alpha, eps, iters

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        sc = self.rlap(g, key)
        # self-loops only on surviving nodes, as the relabeled-subgraph dense
        # PPR would see (add_self_loop=False there because rLap output keeps
        # weights; the reference passes add_self_loop=False too)
        return ppr_diffusion_graph(sc, self.alpha, self.eps, self.iters,
                                   add_self_loop=False,
                                   edge_capacity=g.edge_capacity)


def rlap_ppr_diffusion_cached(frac: float, refresh_every: int = 50,
                              **kw) -> CachedAugmentor:
    return CachedAugmentor(RLapPPRDiffusion(frac, **kw),
                           refresh_every=refresh_every)
