"""Multi-process jax.distributed worker: one of N coordinator-connected
processes, each exposing 4 virtual CPU devices, forming a global
(replica=N, data=4) mesh — the real multi-host wiring (BASELINE configs[4]
"across N>=2 hosts") exercised without multi-host hardware.

Runs (1) the distributed rLap on a sender-partitioned graph over the inner
"data" axis and (2) one GRACE gradient step whose psums span BOTH mesh axes
(the replica axis crosses processes, i.e. would ride DCN on real pods).

Launched by tests/test_multiprocess.py:
    python tools/dist_worker.py <process_id> <num_processes> <port>
Prints "DIST_WORKER_OK pid=<i> loss=<x>" on success.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlap_tpu.core import graph as G
    from rlap_tpu.data.synthetic import barabasi_albert, synthetic_node_dataset
    from rlap_tpu.models.common import torch_adam
    from rlap_tpu.models.grace import GRACE
    from rlap_tpu.objectives.contrast import DualBranchContrast
    from rlap_tpu.parallel.mesh import make_mesh_2level
    from rlap_tpu.parallel.partition import partition_edges_by_sender
    from rlap_tpu.parallel.rlap_dist import eliminate_sharded

    mesh = make_mesh_2level()  # (replica=nproc, data=4) across processes
    assert dict(mesh.shape) == {"replica": nproc, "data": 4}, mesh.shape

    def globalize(x, spec):
        """Build a process-spanning global array from the (identical)
        host-local value every process computed deterministically."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    def globalize_graph(g, edge_spec, node_spec):
        return g.replace(
            senders=globalize(g.senders, edge_spec),
            receivers=globalize(g.receivers, edge_spec),
            weights=globalize(g.weights, edge_spec),
            x=None if g.x is None else globalize(g.x, node_spec),
            node_mask=None if g.node_mask is None
            else globalize(g.node_mask, node_spec),
        )

    # --- 1. distributed rLap across the process boundary ------------------
    ng = 1024
    gbig = partition_edges_by_sender(barabasi_albert(ng, 4, seed=0), 4)
    gbig = globalize_graph(gbig, P("data"), P())
    out, removed, overflow = eliminate_sharded(
        gbig, jax.random.PRNGKey(1), ng // 2, mesh, axis="data")
    removed = int(np.asarray(removed.addressable_data(0)))
    assert removed == ng // 2, removed
    assert not bool(np.asarray(overflow.addressable_data(0)))

    # --- 2. one GRACE grad step: psums over BOTH axes ----------------------
    n, f, e_cap = 256, 32, 4096
    g, _ = synthetic_node_dataset(n=n, feature_dim=f, edge_capacity=e_cap,
                                  seed=0)
    g = partition_edges_by_sender(g, 4)
    model = GRACE(hidden_dim=32, num_layers=2, proj_dim=32, mesh=mesh)
    params = model.init(jax.random.PRNGKey(0), g, g)["params"]
    contrast = DualBranchContrast(loss="infonce_batched", mode="L2L",
                                  tau=0.2, block_size=64)
    tx = torch_adam(1e-3, 1e-5)
    opt_state = tx.init(params)

    g = globalize_graph(g, P("data"), P())
    params = jax.tree.map(lambda x: globalize(x, P()), params)
    opt_state = jax.tree.map(
        lambda x: globalize(x, P()) if hasattr(x, "shape") else x,
        opt_state)

    def train_step(params, opt_state, g, key):
        k1, k2 = jax.random.split(key)
        g1, _, _ = eliminate_sharded(g, k1, n // 4, mesh, axis="data")
        g2, _, _ = eliminate_sharded(g, k2, n // 4, mesh, axis="data")
        g1 = G.coalesce_fast(g1)
        g2 = G.coalesce_fast(g2)
        g1 = g1.replace(weights=g1.edge_mask.astype(g1.weights.dtype))
        g2 = g2.replace(weights=g2.edge_mask.astype(g2.weights.dtype))

        def loss_fn(p):
            h1, h2 = model.apply({"params": p}, g1, g2)
            return contrast(h1=h1, h2=h2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step)
    with mesh:
        params, opt_state, loss = step(params, opt_state, g,
                                       jax.random.PRNGKey(0))
        jax.block_until_ready(loss)
    lv = float(np.asarray(loss.addressable_data(0)))
    assert np.isfinite(lv), lv
    print(f"DIST_WORKER_OK pid={pid} loss={lv:.4f}", flush=True)


if __name__ == "__main__":
    main()
