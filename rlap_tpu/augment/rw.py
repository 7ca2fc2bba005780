"""Random-walk subgraph sampling (PyGCL `A.RWSampling(num_seeds, walk_length)`
used by the "RandomWalkSubgraph" registry entry, `node_shared.py:461-474`).

TPU-native: walks advance as a `lax.scan` over steps; each step samples a
uniform live neighbor per walker via the sorted-CSR trick
(edge slot = segment_start[v] + floor(u * deg[v]))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor
from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph


def random_walk_nodes(g: Graph, key: jax.Array, num_seeds: int,
                      walk_length: int) -> jax.Array:
    """bool[num_nodes]: nodes visited by `num_seeds` walks of `walk_length`."""
    gs = G.coalesce(g)
    n = gs.num_nodes
    deg = G.degrees(gs).astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(deg)])
    k_seed, k_step = jax.random.split(key)
    cur = jax.random.randint(k_seed, (num_seeds,), 0, n)
    visited = jnp.zeros((n,), bool).at[cur].set(True)

    recv = jnp.concatenate([gs.receivers,
                            jnp.full((1,), n, gs.receivers.dtype)])

    def step(carry, k):
        cur, visited = carry
        u = jax.random.uniform(k, (num_seeds,))
        d = deg[cur]
        off = jnp.floor(u * jnp.maximum(d, 1)).astype(jnp.int32)
        slot = jnp.where(d > 0, start[cur] + jnp.minimum(off, d - 1),
                         gs.edge_capacity)
        nxt = recv[jnp.minimum(slot, gs.edge_capacity)]
        cur = jnp.where(nxt < n, nxt, cur)  # stuck walkers stay put
        visited = visited.at[cur].set(True)
        return (cur, visited), None

    keys = jax.random.split(k_step, walk_length)
    (cur, visited), _ = jax.lax.scan(step, (cur, visited), keys)
    return visited


class RWSampling(Augmentor):
    def __init__(self, num_seeds: int, walk_length: int = 10):
        self.num_seeds = num_seeds
        self.walk_length = walk_length

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        visited = random_walk_nodes(g, key, self.num_seeds, self.walk_length)
        if g.node_mask is not None:
            visited = visited & g.node_mask
        return G.induced_subgraph(g, visited)
