"""Topology augmentors: edge addition/removal, node dropping.

Reference semantics: `EdgeAdding` (`augmentor_benchmarks.py:44-65`) inserts
`pe * E` uniformly random edges then coalesces; PyGCL `EdgeRemoving(pe)`
drops edges with prob pe; PyGCL `NodeDropping(pn)` removes all edges of a
pn-Bernoulli node subset. Removal here is per *undirected pair* (both
directions share one coin) so symmetric graphs stay symmetric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor
from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph


class EdgeAdding(Augmentor):
    def __init__(self, pe: float):
        self.pe = pe

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        cap = g.edge_capacity
        n = g.num_nodes
        add_cap = max(int(self.pe * cap) + 1, 1)
        num_add = (self.pe * g.num_edges).astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        # both directions of each sampled pair, so symmetry is preserved
        half = (add_cap + 1) // 2
        u = jax.random.randint(k1, (half,), 0, n)
        v = jax.random.randint(k2, (half,), 0, n)
        live = (jnp.arange(half) * 2 < num_add) & (u != v)
        if g.node_mask is not None:
            live = live & g.node_mask[u] & g.node_mask[v]
        s_new = jnp.where(live, u, n)
        r_new = jnp.where(live, v, n)
        big = Graph(
            senders=jnp.concatenate([g.senders, s_new, r_new]),
            receivers=jnp.concatenate([g.receivers, r_new, s_new]),
            weights=jnp.concatenate([
                g.weights,
                jnp.where(live, 1.0, 0.0).astype(g.weights.dtype),
                jnp.where(live, 1.0, 0.0).astype(g.weights.dtype)]),
            num_nodes=n, x=g.x, node_mask=g.node_mask)
        return G.coalesce(G.drop_zero_weight(big), reduce="max")


class EdgeRemoving(Augmentor):
    def __init__(self, pe: float):
        self.pe = pe

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        gs = G.coalesce(g)
        mirror = G.mirror_indices(gs)
        u = jax.random.uniform(key, (gs.edge_capacity,))
        # one coin per undirected pair: both directions read the canonical
        # (smaller-index) slot's uniform
        canon = jnp.minimum(jnp.arange(gs.edge_capacity, dtype=jnp.int32),
                            mirror)
        keep = (u[canon] >= self.pe) & gs.edge_mask
        return gs.replace(
            senders=jnp.where(keep, gs.senders, gs.num_nodes),
            receivers=jnp.where(keep, gs.receivers, gs.num_nodes),
            weights=jnp.where(keep, gs.weights, 0.0),
        )


class NodeDropping(Augmentor):
    def __init__(self, pn: float):
        self.pn = pn

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        keep = jax.random.uniform(key, (g.num_nodes,)) >= self.pn
        if g.node_mask is not None:
            keep = keep & g.node_mask
        return G.induced_subgraph(g, keep)
