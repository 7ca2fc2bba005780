"""Small building-block layers shared by the encoders."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch.nn.PReLU default),
    the activation of the reference GCN encoders (`node_shared.py:236`)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", lambda k: jnp.asarray(self.init_slope,
                                                      x.dtype))
        return jnp.where(x >= 0, x, a * x)


class MLP(nn.Module):
    """Dense -> act -> ... -> Dense. Used for GIN conv nets and projection
    heads (`graph_shared.py:96-97`, `node_shared.py:253-257`)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the node axis that ignores padding rows.

    The reference's GIN encoders interleave `nn.BatchNorm1d`
    (`graph_shared.py:100-130`); on padded node sets the statistics must be
    computed over real nodes only.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 use_running_average: bool = False):
        f = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), x.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), x.dtype))
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / cnt
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def global_add_pool(x: jax.Array, segment_ids: jax.Array,
                    num_graphs: int) -> jax.Array:
    """Sum-pool node features per graph: [N, F] -> [num_graphs, F].

    Padding nodes carry segment id == num_graphs and are dropped.
    """
    return jax.ops.segment_sum(x, segment_ids, num_segments=num_graphs + 1)[:-1]


def global_mean_pool(x: jax.Array, segment_ids: jax.Array,
                     num_graphs: int) -> jax.Array:
    s = global_add_pool(x, segment_ids, num_graphs)
    cnt = jax.ops.segment_sum(jnp.ones((x.shape[0],), x.dtype), segment_ids,
                              num_segments=num_graphs + 1)[:-1]
    return s / jnp.maximum(cnt, 1.0)[:, None]
