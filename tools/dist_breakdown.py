"""Per-collective time breakdown for the sharded elimination kernel
(VERDICT r4 item 3): is the 8-virtual-device scaling number compute-bound
or collective-latency-bound?

The kernel's per-round collective schedule is inherently serial:

    AG_1 -> AG_2 -> AG_3 -> (sample) -> A2A -> (merge)

Each Luby sub-round's selection depends on the previous sub-round's
GLOBAL neighbor minima (sel_k feeds pack_{k+1}), so the `subiters` block
all_gathers cannot be fused into one exchange without exchanging k-hop
neighborhoods (more data than k gathers); the all_to_all consumes the
sampled emissions, which depend on the final selection. What CAN move is
the per-round collective COUNT (subiters) and the per-collective payload
(already minimal: one n/P-element int32 block per AG, one packed
[P, lanes, cap_route] buffer per A2A).

This tool measures, on the same mesh and shapes as bench_scaling.py:
  * each collective standalone (microbenchmark under shard_map),
  * the full kernel (total ms/call + round count),
and attributes total = rounds x (subiters x AG + A2A) + compute.

Usage: python tools/dist_breakdown.py [n] [subiters]
"""

from __future__ import annotations

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_fn(fn, args, reps=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    subiters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    devs = jax.devices()
    p = len(devs)
    mesh = Mesh(np.asarray(devs), ("data",))

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.parallel.partition import partition_edges_by_sender
    from rlap_tpu.parallel.rlap_dist import _eliminate_sharded_jit

    g = barabasi_albert(n, 8, seed=0)
    gp = partition_edges_by_sender(g, p)
    t = n // 2
    e_live = int(np.asarray(g.edge_mask).sum())

    # shapes the kernel actually exchanges (mirror rlap_dist.py)
    block_sz = -(-n // p)
    in_cap = gp.senders.shape[0] // p
    cap = 2 * in_cap
    cap_route = max(min(cap // max(4, 4 * p), cap), 128)
    lanes = 2 if n * (n + 2) < np.iinfo(np.int32).max else 3

    # --- standalone collectives at kernel shapes -------------------------
    @jax.jit
    def ag_probe(x):
        def body(xs):
            own = xs.reshape(-1)[:block_sz]
            # out_specs P("data"): each shard keeps its gathered copy
            # (the probe measures collective cost, not layout)
            return jax.lax.all_gather(own, "data", tiled=True)[:n]
        return shard_map(body, mesh=mesh, in_specs=P("data"),
                         out_specs=P("data"))(x)

    @jax.jit
    def a2a_probe(x):
        def body(buf):
            return jax.lax.all_to_all(buf[0], "data", split_axis=0,
                                      concat_axis=0, tiled=False)
        return shard_map(body, mesh=mesh, in_specs=P("data"),
                         out_specs=P("data"))(x)

    xa = jnp.zeros((p * block_sz,), jnp.int32)
    ag_ms = bench_fn(ag_probe, (xa,)) * 1e3
    xb = jnp.zeros((p, p, lanes, cap_route), jnp.int32)
    a2a_ms = bench_fn(a2a_probe, (xb,)) * 1e3
    log(f"standalone: all_gather({block_sz} i32) {ag_ms:.2f} ms, "
        f"all_to_all([{p},{lanes},{cap_route}] i32) {a2a_ms:.2f} ms")

    # --- full kernel -----------------------------------------------------
    key = jax.random.PRNGKey(0)

    def run(seed):
        s, r, w, removed, rounds, ovf = _eliminate_sharded_jit(
            gp.senders, gp.receivers, gp.weights,
            jax.random.fold_in(key, seed), t, n, mesh=mesh, axis="data",
            o_v="random", subiters=subiters, slack=2)
        return w.sum(), removed, rounds, ovf

    wsum, removed, rounds, ovf = jax.block_until_ready(run(0))
    rounds = int(rounds)
    assert not bool(ovf) and int(removed) == t
    reps = 5
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, r_, ovf = run(i)
        _ = float(wsum)
    total_ms = (time.perf_counter() - t0) / reps * 1e3

    coll_ms = rounds * (subiters * ag_ms + a2a_ms)
    out = {
        "n": n, "n_devices": p, "subiters": subiters,
        "rounds": rounds,
        "total_ms": round(total_ms, 1),
        "edges_per_s": round(e_live / (total_ms / 1e3)),
        "ag_ms_each": round(ag_ms, 3),
        "a2a_ms_each": round(a2a_ms, 3),
        "collectives_per_round": subiters + 1,
        "collective_ms_total": round(coll_ms, 1),
        "collective_fraction": round(coll_ms / total_ms, 3),
        "compute_ms_total": round(total_ms - coll_ms, 1),
    }
    log(f"rounds={rounds} total={total_ms:.0f} ms; collectives "
        f"{coll_ms:.0f} ms ({coll_ms / total_ms:.0%})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
