"""Shared trainer plumbing for the five GCL recipes."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


def torch_adam(lr: float, weight_decay: float = 0.0):
    """torch.optim.Adam semantics: L2 decay added to the gradient *before*
    the moment updates (what every reference recipe uses)."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    return optax.adam(lr)


class EarlyStopper:
    """Stop when train loss hasn't improved for `tolerance` epochs
    (`node_shared.py:510-528`)."""

    def __init__(self, tolerance: int = 50):
        self.tolerance = tolerance
        self.best = float("inf")
        self.count = 0

    def update(self, loss: float) -> bool:
        if loss < self.best:
            self.best = loss
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.tolerance


def make_union_batches(graphs, batch_size: int, shuffle_seed: int = 0):
    """Host-side: shuffle and pad graphs into fixed-capacity block-diagonal
    unions so every batch compiles to the same program. The per-batch union
    is the reference's DataLoader semantics (`graph_shared.py:152-169`):
    augmentors see ONE disjoint-union graph per batch. Shared by the
    GraphCL and BGRL trainers."""
    import numpy as np

    from rlap_tpu.core import graph as G

    idx = np.random.default_rng(shuffle_seed).permutation(len(graphs))
    batches = []
    for start in range(0, len(idx), batch_size):
        chunk = [graphs[int(i)] for i in idx[start:start + batch_size]]
        ncap = ((sum(g.num_nodes for g in chunk) + 127) // 128) * 128
        ecap = ((sum(int(g.num_edges) for g in chunk) + 255) // 256) * 256
        batch, seg = G.block_diagonal(chunk, node_capacity=ncap,
                                      edge_capacity=ecap)
        batches.append((batch, seg, len(chunk)))
    return batches
