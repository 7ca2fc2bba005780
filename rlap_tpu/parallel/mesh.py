"""Device mesh + sharding helpers.

The reference has no distributed layer (SURVEY.md §2.3); this is designed
from BASELINE.json's north star: edge-partitioned graphs over a
`jax.sharding.Mesh`, XLA collectives over ICI (intra-slice axis "data"),
DCN handled by adding an outer axis when multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlap_tpu.core.graph import Graph


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def graph_shardings(mesh: Mesh, axis: str = "data"):
    """Shardings for a Graph pytree: edge arrays sharded along the edge axis,
    features sharded along nodes, node_mask sharded along nodes."""
    edge = NamedSharding(mesh, P(axis))
    nodes = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return Graph(
        senders=edge, receivers=edge, weights=edge,
        num_nodes=0,  # static leaf ignored
        x=nodes, node_mask=nodes,
    )


def shard_graph(g: Graph, mesh: Mesh, axis: str = "data",
                shard_nodes: bool = False) -> Graph:
    """Place a Graph on the mesh: edges sharded; features/node_mask sharded
    or replicated. Capacities must divide the axis size (pad first)."""
    edge = NamedSharding(mesh, P(axis))
    node = NamedSharding(mesh, P(axis)) if shard_nodes else NamedSharding(
        mesh, P())
    return g.replace(
        senders=jax.device_put(g.senders, edge),
        receivers=jax.device_put(g.receivers, edge),
        weights=jax.device_put(g.weights, edge),
        x=None if g.x is None else jax.device_put(g.x, node),
        node_mask=None if g.node_mask is None else jax.device_put(
            g.node_mask, node),
    )
