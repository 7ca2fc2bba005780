"""jax.random key plumbing.

Replaces the reference's ad-hoc `std::random_device` / `std::mt19937`
generators (`rlap/csrc/preconditioner.cc:594-595,721-722`) with functional,
reproducible threefry keys. Every stochastic op in the framework takes an
explicit key; helpers here keep call sites tidy.
"""

from __future__ import annotations

import jax


def split_like(key: jax.Array, n: int):
    return jax.random.split(key, n)


def fold(key: jax.Array, data) -> jax.Array:
    """Fold a (traced or static) int into a key — used for per-round keys."""
    return jax.random.fold_in(key, data)


class KeySeq:
    """Host-side convenience: an infinite sequence of fresh keys."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def __next__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    next = __next__
