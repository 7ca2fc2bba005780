"""GCA-style adaptive edge dropping (degree / PageRank / eigenvector
centrality), reference `scripts/augmentor_benchmarks.py:216-363`.

Centralities are computed TPU-natively: PageRank and eigenvector centrality
are both sparse-matvec power iterations over the padded COO edge list (the
reference calls networkx for EVC, `augmentor_benchmarks.py:230-234`; here a
`lax.fori_loop` of `spmm`s replaces it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor
from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.ops.spmm import spmm


def compute_pagerank(g: Graph, damp: float = 0.85, k: int = 10) -> jax.Array:
    """PageRank power iteration (`compute_pr`, augmentor_benchmarks.py:216-227):
    x <- (1-damp) * x + damp * A^T (x / deg_out), x0 = ones."""
    deg_out = G.degrees(g)
    x = jnp.ones((g.num_nodes,), g.weights.dtype)
    inv_deg = jnp.where(deg_out > 0, 1.0 / jnp.maximum(deg_out, 1.0), 0.0)

    def body(_, x):
        msgs = (x * inv_deg)[:, None]
        agg = spmm(g, msgs, edge_weights=g.edge_mask.astype(x.dtype))[:, 0]
        return (1 - damp) * x + damp * agg

    return jax.lax.fori_loop(0, k, body, x)


def eigenvector_centrality(g: Graph, iters: int = 100) -> jax.Array:
    """Power-method EVC on the (unweighted) adjacency — replaces the
    reference's networkx call with a TPU-native iteration."""
    x = jnp.ones((g.num_nodes,), g.weights.dtype)
    w1 = g.edge_mask.astype(x.dtype)

    def body(_, x):
        y = spmm(g, x[:, None], edge_weights=w1)[:, 0] + x
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-12)

    return jax.lax.fori_loop(0, iters, body, x)


def _normalize_drop_scores(s: jax.Array, mask: jax.Array) -> jax.Array:
    """w = (s_max - s) / (s_max - s_mean) over live edges
    (augmentor_benchmarks.py:252,271,286)."""
    big = jnp.asarray(-jnp.inf, s.dtype)
    smax = jnp.max(jnp.where(mask, s, big))
    cnt = jnp.maximum(jnp.sum(mask.astype(s.dtype)), 1.0)
    smean = jnp.sum(jnp.where(mask, s, 0.0)) / cnt
    return (smax - s) / jnp.maximum(smax - smean, 1e-12)


def degree_drop_weights(g: Graph) -> jax.Array:
    """s = log(deg(receiver)) (augmentor_benchmarks.py:247-254)."""
    deg = G.degrees(g)
    degp = jnp.concatenate([deg, jnp.ones((1,), deg.dtype)])
    s = jnp.log(jnp.maximum(degp[g.receivers], 1e-12))
    return _normalize_drop_scores(s, g.edge_mask)


def pr_drop_weights(g: Graph, aggr: str = "sink", k: int = 10) -> jax.Array:
    """s from log PageRank of sink/source/mean endpoint
    (augmentor_benchmarks.py:257-273)."""
    pv = compute_pagerank(g, k=k)
    pvp = jnp.concatenate([pv, jnp.ones((1,), pv.dtype)])
    s_row = jnp.log(jnp.maximum(pvp[g.senders], 1e-12))
    s_col = jnp.log(jnp.maximum(pvp[g.receivers], 1e-12))
    s = {"sink": s_col, "source": s_row,
         "mean": 0.5 * (s_row + s_col)}.get(aggr, s_col)
    return _normalize_drop_scores(s, g.edge_mask)


def evc_drop_weights(g: Graph) -> jax.Array:
    """s = log(EVC(receiver) + 1e-8) (augmentor_benchmarks.py:276-286)."""
    evc = eigenvector_centrality(g)
    evc = jnp.maximum(evc, 0.0) + 1e-8
    evcp = jnp.concatenate([evc, jnp.ones((1,), evc.dtype)])
    s = jnp.log(evcp[g.receivers])
    return _normalize_drop_scores(s, g.edge_mask)


def drop_edge_weighted(g: Graph, drop_w: jax.Array, key: jax.Array,
                       p: float, threshold: float = 1.0) -> Graph:
    """Bernoulli drop with prob min(p * w / mean(w), threshold)
    (augmentor_benchmarks.py:237-244). `g` must already be coalesced/sorted
    so `drop_w` lines up with its edge slots; one coin per undirected pair
    keeps symmetric graphs symmetric.
    """
    mask = g.edge_mask
    cnt = jnp.maximum(jnp.sum(mask.astype(drop_w.dtype)), 1.0)
    mean_w = jnp.sum(jnp.where(mask, drop_w, 0.0)) / cnt
    prob = jnp.minimum(drop_w / jnp.maximum(mean_w, 1e-12) * p, threshold)
    u = jax.random.uniform(key, (g.edge_capacity,))
    mirror = G.mirror_indices(g)
    canon = jnp.minimum(jnp.arange(g.edge_capacity, dtype=jnp.int32), mirror)
    keep = (u[canon] >= prob) & mask
    return g.replace(
        senders=jnp.where(keep, g.senders, g.num_nodes),
        receivers=jnp.where(keep, g.receivers, g.num_nodes),
        weights=jnp.where(keep, g.weights, 0.0),
    )


class _AdaptiveEdgeDropping(Augmentor):
    def __init__(self, p: float, threshold: float = 0.7):
        self.p = p
        self.threshold = threshold

    def _scores(self, g: Graph) -> jax.Array:
        raise NotImplementedError

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        gs = G.coalesce(g)  # sorted canonical list so scores line up
        drop_w = self._scores(gs)
        return drop_edge_weighted(gs, drop_w, key, self.p, self.threshold)


class EdgeDroppingDegree(_AdaptiveEdgeDropping):
    def _scores(self, g):
        return degree_drop_weights(g)


class EdgeDroppingPR(_AdaptiveEdgeDropping):
    def _scores(self, g):
        return pr_drop_weights(g)


class EdgeDroppingEVC(_AdaptiveEdgeDropping):
    def _scores(self, g):
        return evc_drop_weights(g)
