"""Edge partitioning for multi-chip execution.

The graph analogue of sequence partitioning (SURVEY.md §2.3): edges are
assigned to shards by **sender block** (node ids striped into contiguous
blocks), so every edge (i, j) lives on the shard that owns node i. This
guarantees the elimination kernel's column gather for any node is shard-local
and SpMM's scatter target ranges are disjoint per shard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph


def node_block_owner(node_ids: jax.Array, num_nodes: int,
                     num_shards: int) -> jax.Array:
    """Owner shard of each node id under contiguous equal blocks."""
    block = -(-num_nodes // num_shards)
    return jnp.minimum(node_ids // block, num_shards - 1)


def partition_edges_by_sender(g: Graph, num_shards: int) -> Graph:
    """Reorder + pad edges so shard s's slice [s*cap_s : (s+1)*cap_s] holds
    exactly the edges whose sender is in node block s (padding elsewhere).
    Host-side (placement happens once per graph); returns a Graph whose edge
    capacity is num_shards * per_shard_capacity.
    """
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(g.weights)
    mask = s < g.num_nodes
    block = -(-g.num_nodes // num_shards)
    owner = np.minimum(s[mask] // block, num_shards - 1)
    counts = np.bincount(owner, minlength=num_shards)
    cap = int(((counts.max() + 127) // 128) * 128) if counts.size else 128
    ss = np.full((num_shards, cap), g.num_nodes, np.int32)
    rr = np.full((num_shards, cap), g.num_nodes, np.int32)
    ww = np.zeros((num_shards, cap), w.dtype)
    for shard in range(num_shards):
        sel = owner == shard
        k = int(sel.sum())
        ss[shard, :k] = s[mask][sel]
        rr[shard, :k] = r[mask][sel]
        ww[shard, :k] = w[mask][sel]
    return g.replace(senders=jnp.asarray(ss.reshape(-1)),
                     receivers=jnp.asarray(rr.reshape(-1)),
                     weights=jnp.asarray(ww.reshape(-1)))
