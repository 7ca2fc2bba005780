"""CCA-SSG feature-decorrelation objective.

Reference (`CCA-SSG/main.py:111-124`, `CCA-SSG/model.py:73-80`): embeddings
are standardized per dimension, then
  loss = -tr(z1ᵀz2)/N + lam * (||I - z1ᵀz1/N||_F² + ||I - z2ᵀz2/N||_F²).
The DxD covariance matmuls are the hot path — pure MXU work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def standardize(z: jax.Array, node_mask: Optional[jax.Array] = None,
                eps: float = 1e-8) -> jax.Array:
    """(z - mean) / (std * sqrt(N)) per dimension (`model.py:77-78`)."""
    if node_mask is None:
        n = z.shape[0]
        mean = jnp.mean(z, axis=0)
        var = jnp.var(z, axis=0)
    else:
        m = node_mask.astype(z.dtype)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(z * m, axis=0) / n
        var = jnp.sum(((z - mean) ** 2) * m, axis=0) / n
        z = z * m  # zero padding rows so covariances ignore them
    return (z - mean) * jax.lax.rsqrt(var * n + eps)


def cca_ssg_loss(z1: jax.Array, z2: jax.Array, lam: float = 1e-3,
                 node_mask: Optional[jax.Array] = None,
                 pre_standardized: bool = False) -> jax.Array:
    if not pre_standardized:
        z1 = standardize(z1, node_mask)
        z2 = standardize(z2, node_mask)
    elif node_mask is not None:
        m = node_mask.astype(z1.dtype)[:, None]
        z1, z2 = z1 * m, z2 * m
    d = z1.shape[1]
    eye = jnp.eye(d, dtype=z1.dtype)
    c = z1.T @ z2
    c1 = z1.T @ z1
    c2 = z2.T @ z2
    inv = -jnp.trace(c)
    dec = jnp.sum((eye - c1) ** 2) + jnp.sum((eye - c2) ** 2)
    return inv + lam * dec
