"""Tensor parallelism for the encoders: shard Dense kernels' output
(hidden) dimension over a mesh axis.

The reference has no TP (SURVEY.md §2.3 deprioritizes it at dims 128-512,
where weights are KBs), but at production widths the GCN/GIN dense layers
are the FLOPs and their kernels are the largest parameters. The TPU-native
form needs no model changes: annotate each kernel's output dim with a
NamedSharding over the "model" axis and let GSPMD partition the matmuls
(activations stay replicated; XLA inserts the all-gathers/reduce-scatters
that the sharding implies, riding ICI).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place a flax param pytree on `mesh` with every rank-2 'kernel' leaf
    sharded over its OUTPUT dim along `axis` (1D weight-vector leaves and
    biases replicate). Requires each kernel's output dim to divide the axis
    size. Returns the resharded pytree."""
    repl = NamedSharding(mesh, P())
    size = mesh.shape[axis]

    def place(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (name == "kernel" and getattr(leaf, "ndim", 0) == 2
                and leaf.shape[1] % size == 0):
            return jax.device_put(leaf, NamedSharding(mesh, P(None, axis)))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, params)
