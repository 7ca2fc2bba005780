"""Feature-space augmentors (PyGCL FeatureMasking / FeatureDropout parity;
every reference pipeline pairs a topology augmentor with
`A.FeatureMasking(pf=0.3)`, `node_shared.py:330-487`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlap_tpu.augment.base import Augmentor
from rlap_tpu.core.graph import Graph


def mask_feature_dims(x: jax.Array, key: jax.Array, pf: float) -> jax.Array:
    """Zero whole feature dimensions with prob pf (PyGCL drop_feature: the
    same column mask for all nodes)."""
    keep = jax.random.uniform(key, (x.shape[-1],)) >= pf
    return x * keep.astype(x.dtype)[None, :]


def dropout_features(x: jax.Array, key: jax.Array, pf: float) -> jax.Array:
    """Per-element Bernoulli zeroing (PyGCL FeatureDropout)."""
    keep = jax.random.uniform(key, x.shape) >= pf
    return x * keep.astype(x.dtype)


class FeatureMasking(Augmentor):
    def __init__(self, pf: float):
        self.pf = pf

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        if g.x is None:
            return g
        return g.replace(x=mask_feature_dims(g.x, key, self.pf))


class FeatureDropout(Augmentor):
    def __init__(self, pf: float):
        self.pf = pf

    def augment(self, g: Graph, key: jax.Array) -> Graph:
        if g.x is None:
            return g
        return g.replace(x=dropout_features(g.x, key, self.pf))
