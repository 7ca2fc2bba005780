"""Sharded SpMM via shard_map: edge-partitioned aggregation with an ICI
all-reduce, the distributed hot loop of every encoder.

Design (SURVEY.md §2.3 / scaling-book recipe): edges are sharded over the
"data" axis; node features are replicated (small graphs) or gathered; each
shard segment-sums its local edges into a full-width [N, F] partial and a
single `psum` over ICI combines partials. With sender-block partitioning the
partials touch disjoint row ranges, so the psum is bandwidth-optimal for
XLA to schedule (it can lower to reduce-scatter + all-gather).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rlap_tpu.core.graph import Graph


def spmm_edge_partitioned(g: Graph, x: jax.Array, mesh: Mesh,
                          axis: str = "data",
                          edge_weights: Optional[jax.Array] = None):
    """out[i] = sum over sharded edges (j -> i) of w_e x[j]; x replicated."""
    n = g.num_nodes
    w = g.weights if edge_weights is None else edge_weights

    def local(s, r, w, x):
        xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
        msgs = xp[s] * w[:, None].astype(x.dtype)
        part = jax.ops.segment_sum(msgs, r, num_segments=n + 1)[:n]
        return jax.lax.psum(part, axis)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P()),
                   out_specs=P())
    return fn(g.senders, g.receivers, w, x)
