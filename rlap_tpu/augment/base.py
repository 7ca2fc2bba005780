"""Augmentor protocol: pure functions (Graph, key) -> Graph.

The TPU-native counterpart of PyGCL's `Augmentor`/`Compose` classes used
throughout the reference (`scripts/augmentor_benchmarks.py`,
`scripts/node_shared.py:330-487`): stateless, explicitly keyed, jittable.
Host-side caching (the reference's `use_cache`/`refresh_cache_freq`
machinery, `augmentor_benchmarks.py:117-127`) lives in `CachedAugmentor`.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax

from rlap_tpu.core.graph import Graph


class Augmentor:
    """Base: subclasses implement `augment(g, key) -> Graph`."""

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        raise NotImplementedError

    def __call__(self, g: Graph, key: jax.Array) -> Graph:
        return self.augment(g, key)

    def traceable(self, g: Graph, key: jax.Array) -> Graph:
        """Fully-traceable variant for whole-pipeline `jax.jit` analysis
        (compiled-memory benchmarks): identical semantics except host-side
        branches (e.g. rLap's overflow escalation) are omitted. Defaults
        to `augment`; override where augment syncs to the host."""
        return self.augment(g, key)


class Identity(Augmentor):
    def augment(self, g: Graph, key: jax.Array) -> Graph:
        return g


class Compose(Augmentor):
    def __init__(self, augmentors: Sequence[Augmentor]):
        self.augmentors = list(augmentors)

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        for i, aug in enumerate(self.augmentors):
            g = aug(g, jax.random.fold_in(key, i))
        return g

    def traceable(self, g: Graph, key: jax.Array) -> Graph:
        for i, aug in enumerate(self.augmentors):
            g = aug.traceable(g, jax.random.fold_in(key, i)) \
                if isinstance(aug, Augmentor) else aug(
                    g, jax.random.fold_in(key, i))
        return g


class RandomChoice(Augmentor):
    """Pick `num_choices` augmentors at random per call (PyGCL parity).
    Host-side randomness (selection is a python-level branch)."""

    def __init__(self, augmentors: Sequence[Augmentor], num_choices: int = 1):
        self.augmentors = list(augmentors)
        self.num_choices = num_choices
        self._counter = 0

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        import numpy as np
        sel_key = jax.random.fold_in(key, 0xC401CE)
        idx = np.asarray(
            jax.random.choice(sel_key, len(self.augmentors),
                              (self.num_choices,), replace=False))
        for j, i in enumerate(idx):
            g = self.augmentors[int(i)](g, jax.random.fold_in(key, j + 1))
        return g

    def traceable(self, g: Graph, key: jax.Array) -> Graph:
        raise NotImplementedError(
            "RandomChoice selects its branch on the host; a single traced "
            "program cannot represent it (per-branch memory differs)")


class CachedAugmentor(Augmentor):
    """Wraps an augmentor with refresh-every-k-calls caching
    (`augmentor_benchmarks.py:117-127`, `CCA-SSG/aug.py:152-159`)."""

    def __init__(self, inner: Augmentor, refresh_every: int = 50):
        self.inner = inner
        self.refresh_every = refresh_every
        self._cache = None
        self._count = 0

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        if self._cache is not None and self._count < self.refresh_every:
            self._count += 1
            return self._cache
        out = self.inner(g, key)
        self._cache = out
        self._count = 1
        return out

    def traceable(self, g: Graph, key: jax.Array) -> Graph:
        # the cache is a host-side wrapper; the compiled-memory footprint
        # of interest is the underlying pipeline's
        inner = self.inner
        return (inner.traceable(g, key) if isinstance(inner, Augmentor)
                else inner(g, key))
