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
