"""ogbn-arxiv-scale training through the FULL sharded path (VERDICT r4
item 6 / BASELINE configs[4]): CCA-SSG-style step on a ~170k-node graph
with sender-partitioned edges, sharded rLap augmentation
(`eliminate_sharded`, two-key unpacked path — n is beyond the int32
packing bound), and the mesh-aware GCN SpMM, on the 8-virtual-device CPU
mesh. Logs wall-clock per epoch to results/arxiv_scale_ccassg.jsonl.

The graph is a synthetic BA stand-in of ogbn-arxiv's shape (169,343
nodes, ~1.17M undirected edges; zero-egress environment — see DATA.md).
CCA-SSG is the recipe whose loss is linear in n (D x D covariances), the
right choice at this scale.

Usage: python tools/run_arxiv_scale.py [epochs] [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # ogbn-arxiv has 169,343 nodes; round to the next multiple of the
    # mesh width so the GCN's loop-augmented edge capacity
    # (edge_capacity + n) stays divisible by the mesh axis
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 169_344

    from rlap_tpu.core import graph as G
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.models.common import torch_adam
    from rlap_tpu.nn.gcn import GCNEncoder
    from rlap_tpu.objectives.cca import cca_ssg_loss, standardize
    from rlap_tpu.parallel.mesh import make_mesh_2level
    from rlap_tpu.parallel.partition import partition_edges_by_sender
    from rlap_tpu.parallel.rlap_dist import eliminate_sharded

    ndev = len(jax.devices())
    mesh = make_mesh_2level(replica=1, data=ndev)
    print(f"devices: {ndev} x {jax.devices()[0].platform}; "
          f"mesh {dict(mesh.shape)}", flush=True)

    t0 = time.time()
    g = barabasi_albert(n, 7, seed=0)
    f = 128
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, f)).astype(np.float32) / np.sqrt(f)
    # randomly relabel vertices: BA hubs have LOW ids, so contiguous
    # sender blocks would be wildly imbalanced (measured 836k vs 153k
    # edges/shard at this shape) — the skewed shard both wastes every
    # static per-shard capacity and stalls eager collectives past the
    # CPU rendezvous timeout. Relabeling balances blocks to ~E/P each.
    perm = rng.permutation(n).astype(np.int32)
    s0 = np.asarray(g.senders)
    r0 = np.asarray(g.receivers)
    live = s0 < n
    g = g.replace(
        senders=jnp.asarray(np.where(live, perm[np.minimum(s0, n - 1)], n)),
        receivers=jnp.asarray(np.where(live, perm[np.minimum(r0, n - 1)],
                                       n)),
        x=jnp.asarray(x))
    e_live = int(np.asarray(g.edge_mask).sum())
    print(f"graph: n={n} directed_edges={e_live} "
          f"(built in {time.time() - t0:.1f}s)", flush=True)

    g = partition_edges_by_sender(g, ndev)
    edge_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    g = g.replace(
        senders=jax.device_put(g.senders, edge_sh),
        receivers=jax.device_put(g.receivers, edge_sh),
        weights=jax.device_put(g.weights, edge_sh),
        x=jax.device_put(g.x, repl),
        node_mask=jax.device_put(g.node_mask, repl),
    )

    import flax.linen as nn

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, g1, g2):
            enc = GCNEncoder(256, 2, mesh=mesh)
            z1 = standardize(enc(g1, g1.x), g1.node_mask)
            z2 = standardize(enc(g2, g2.x), g2.node_mask)
            return z1, z2

    model = Enc()
    with mesh:
        # jit the init: eager shard_map would run each device's SpMM
        # serially against the 20 s collective-rendezvous watchdog
        params = jax.device_put(
            jax.jit(model.init)(jax.random.PRNGKey(0), g, g)["params"],
            repl)
    tx = torch_adam(1e-3, 0.0)
    opt_state = jax.device_put(tx.init(params), repl)
    num_remove = int(0.2 * n)

    def train_step(params, opt_state, g, key):
        k1, k2 = jax.random.split(key)
        g1, _, o1 = eliminate_sharded(g, k1, num_remove, mesh, axis="data")
        g2, _, o2 = eliminate_sharded(g, k2, num_remove, mesh, axis="data")
        g1 = G.coalesce_fast(g1)
        g2 = G.coalesce_fast(g2)
        # rLap augmentor semantics: drop sampled weights
        g1 = g1.replace(weights=g1.edge_mask.astype(g1.weights.dtype))
        g2 = g2.replace(weights=g2.edge_mask.astype(g2.weights.dtype))

        def loss_fn(p):
            z1, z2 = model.apply({"params": p}, g1, g2)
            return cca_ssg_loss(z1, z2, lam=1e-3, node_mask=g.node_mask,
                                pre_standardized=True)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, o1 | o2

    step = jax.jit(train_step)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "arxiv_scale_ccassg.jsonl")
    records = []
    with mesh:
        t0 = time.time()
        params, opt_state, loss, ovf = step(params, opt_state, g,
                                            jax.random.PRNGKey(100))
        jax.block_until_ready(loss)
        compile_s = time.time() - t0
        print(f"first step (compile + run): {compile_s:.1f}s "
              f"loss={float(loss):.4f} overflow={bool(ovf)}", flush=True)
        for ep in range(epochs):
            t0 = time.time()
            params, opt_state, loss, ovf = step(
                params, opt_state, g, jax.random.PRNGKey(101 + ep))
            jax.block_until_ready(loss)
            dt = time.time() - t0
            rec = dict(event="epoch", epoch=ep, wall_seconds=round(dt, 2),
                       loss=round(float(loss), 4), overflow=bool(ovf),
                       n=n, directed_edges=e_live, n_devices=ndev,
                       recipe="cca_ssg_sharded", backend="cpu-virtual",
                       compile_seconds=round(compile_s, 1))
            records.append(rec)
            print(f"epoch {ep}: {dt:.1f}s loss={float(loss):.4f} "
                  f"overflow={bool(ovf)}", flush=True)
    with open(out_path, "w") as fh:
        for rec in records:
            fh.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
