"""GCN convolution and encoder (flax).

Semantics of PyG `GCNConv` with `cached=False` as used by the reference
GRACE/MVGRL encoders (`scripts/node_shared.py:233-247`,
`scripts/node_dedicated.py:137-153`) and DGL `GraphConv(norm="both")` used by
CCA-SSG (`CCA-SSG/model.py:38-67`): symmetric normalization recomputed every
call (the graph changes per augmentation), x @ W before aggregation so the
matmul hits the MXU at [N, F] x [F, H].
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rlap_tpu.core.graph import Graph
from rlap_tpu.nn.layers import PReLU
from rlap_tpu.ops.spmm import gcn_norm, spmm


class GCNConv(nn.Module):
    """`mesh`: when set, aggregation runs as the edge-partitioned shard_map
    SpMM over the mesh's "data" axis (SURVEY.md §2.3 DP/graph-partition
    rows); otherwise the local segment-sum SpMM. The loop-augmented edge
    capacity (edge_capacity + num_nodes) must divide the mesh axis size."""

    features: int
    use_bias: bool = True
    add_self_loops: bool = True
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        # glorot kernel, zero bias — PyG GCNConv defaults
        x = nn.Dense(self.features, use_bias=False,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name="lin")(x)
        gl, wn = gcn_norm(g, add_self_loops=self.add_self_loops)
        out = spmm(gl, x, edge_weights=wn, mesh=self.mesh)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            out = out + bias
        return out


class GCNEncoder(nn.Module):
    """num_layers x (GCNConv -> PReLU) — the reference `GConv`
    (`node_shared.py:233-247`). A shared per-layer activation slope per
    layer, like torch's default single-parameter PReLU."""

    hidden_dim: int
    num_layers: int = 2
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = GCNConv(self.hidden_dim, mesh=self.mesh,
                        name=f"conv_{i}")(g, x)
            x = PReLU(name=f"act_{i}")(x)
        return x


class ProjectionHead(nn.Module):
    """fc1 -> ELU -> fc2 (`node_shared.py:253-257,268-270`)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        z = nn.Dense(self.hidden_dim, name="fc1")(z)
        z = nn.elu(z)
        return nn.Dense(self.out_dim, name="fc2")(z)
