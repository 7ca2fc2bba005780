"""GIN convolution and encoder (flax).

Reference: `make_gin_conv` = PyG GINConv over a 2-layer MLP
(`scripts/graph_shared.py:96-97`), encoder = num_layers x
(GINConv -> ReLU -> BatchNorm), readout = concat of all layers' sum-pools
(`graph_shared.py:100-130`; same in `graph_shared_g2l.py:137-171`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rlap_tpu.core.graph import Graph
from rlap_tpu.nn.layers import MLP, MaskedBatchNorm, global_add_pool
from rlap_tpu.ops.spmm import spmm


class GINConv(nn.Module):
    """out = MLP((1 + eps) * x + sum_{j in N(i)} x_j), eps fixed at 0
    (PyG default train_eps=False)."""

    hidden_dim: int
    eps: float = 0.0
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        agg = spmm(g, x, mesh=self.mesh)
        h = (1.0 + self.eps) * x + agg
        return MLP([self.hidden_dim, self.hidden_dim], name="mlp")(h)


class GINEncoder(nn.Module):
    """Returns (node_embedding, graph_embedding): both are concats over
    layers of node features / their sum-pools (`graph_shared.py:119-130`)."""

    hidden_dim: int
    num_layers: int = 2
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, segment_ids: jax.Array,
                 num_graphs: int, train: bool = True):
        zs = []
        for i in range(self.num_layers):
            x = GINConv(self.hidden_dim, mesh=self.mesh,
                        name=f"conv_{i}")(g, x)
            x = nn.relu(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(
                x, mask=g.node_mask, use_running_average=not train)
            zs.append(x)
        z = jnp.concatenate(zs, axis=-1)
        if g.node_mask is not None:
            z = z * g.node_mask.astype(z.dtype)[:, None]
        gs = [global_add_pool(zz, segment_ids, num_graphs) for zz in zs]
        return z, jnp.concatenate(gs, axis=-1)
