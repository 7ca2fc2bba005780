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


def make_mesh_2level(replica: Optional[int] = None,
                     data: Optional[int] = None,
                     axis_names=("replica", "data")) -> Mesh:
    """Two-level ("replica", "data") mesh for multi-host topologies.

    The outer "replica" axis maps onto the slow interconnect (DCN across
    hosts when `jax.process_count() > 1`, else a slice of ICI) and carries
    data-parallel gradient psums; the inner "data" axis rides ICI and
    carries the edge-partitioned graph collectives (all_to_all / pmin) of
    the distributed rLap kernel and sharded SpMM. Per the scaling-book
    recipe, the device order from `jax.devices()` already enumerates
    ICI-adjacent devices contiguously, so reshaping [replica, data] puts
    the chatty inner axis on ICI.
    """
    devs = jax.devices()
    nproc = jax.process_count()
    if replica is None:
        replica = nproc if nproc > 1 else 1
    if data is None:
        data = len(devs) // replica
    if replica * data > len(devs):
        raise ValueError(
            f"mesh {replica}x{data} needs {replica * data} devices, "
            f"have {len(devs)}")
    grid = np.asarray(devs[:replica * data]).reshape(replica, data)
    return Mesh(grid, tuple(axis_names))


def init_distributed() -> int:
    """Initialize `jax.distributed` when launched under a multi-host
    coordinator (JAX_COORDINATOR_ADDRESS set); no-op single-host.
    Returns the process count."""
    import os

    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            and jax.process_count() == 1):
        jax.distributed.initialize()
    return jax.process_count()


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
