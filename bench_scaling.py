"""Scaling-efficiency benchmark for the distributed rLap kernel.

Prints ONE JSON line:
  {"metric": "rlap_scaling_efficiency", "value": eff, "unit": "fraction",
   "vs_baseline": eff / 0.8}
where eff = (edges/s on the full mesh) / (num_devices x edges/s on one
device) for `eliminate_sharded`, measured on whatever devices are visible.
The BASELINE.md target is >= 0.8.

On the axon tunnel only one TPU chip is visible, so by default this forces
the CPU backend with 8 virtual devices (`--xla_force_host_platform_device_
count`), the same environment the multi-device tests use; the virtual
devices share one host's cores, so the number reported here reflects the
algorithm's communication/slack overhead, which is the shard-local-compute
+ all_to_all design's honest cost model. On a real multi-chip slice the
same script runs unchanged on the TPU mesh.
"""

from __future__ import annotations

import json
import os
import sys
import time

# force a multi-device backend BEFORE jax init (single-chip axon cannot
# demonstrate scaling); sitecustomize overrides env vars, so pin post-import
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("RLAP_TPU_SCALING_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _throughput(g, gp, mesh, t, reps=3):
    from rlap_tpu.parallel.rlap_dist import eliminate_sharded

    key = jax.random.PRNGKey(0)

    def run(seed):
        out, removed, overflow = eliminate_sharded(
            gp, jax.random.fold_in(key, seed), t, mesh)
        return out.weights.sum(), removed, overflow

    wsum, removed, overflow = run(0)
    _ = float(wsum)
    assert not bool(overflow)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, overflow = run(i)
        _ = float(wsum)  # materialize per call (axon timing gotcha)
    dt = (time.perf_counter() - t0) / reps
    e_live = int(np.asarray(g.edge_mask).sum())
    return e_live / dt


def main():
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.parallel.partition import partition_edges_by_sender

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    t = n // 2
    devs = jax.devices()
    p = len(devs)
    log(f"devices: {p} x {devs[0].platform}")

    g = barabasi_albert(n, 8, seed=0)

    mesh1 = Mesh(np.asarray(devs[:1]), ("data",))
    gp1 = partition_edges_by_sender(g, 1)
    eps1 = _throughput(g, gp1, mesh1, t)
    log(f"1 device: {eps1:,.0f} edges/s")

    meshp = Mesh(np.asarray(devs), ("data",))
    gpp = partition_edges_by_sender(g, p)
    epsp = _throughput(g, gpp, meshp, t)
    log(f"{p} devices: {epsp:,.0f} edges/s")

    eff = epsp / (p * eps1)
    log(f"scaling efficiency at {p} devices: {eff:.3f} (target >= 0.8)")
    if devs[0].platform == "cpu":
        # virtual devices share one host's cores: total throughput cannot
        # exceed ~1x the single-device run, so the ceiling here is 1/p;
        # the ratio below is the fraction of that ceiling the sharded
        # kernel achieves (its communication/slack overhead factor)
        log(f"shared-core ceiling 1/{p} = {1.0/p:.3f}; "
            f"achieved {eff * p:.2f} of ceiling "
            f"(time_{p}dev/time_1dev = {eps1/epsp:.2f}x)")
    print(json.dumps({
        "metric": "rlap_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 3),
        # absolute context: the efficiency RATIO on shared-core virtual
        # devices penalizes absolute kernel speedups (a faster
        # single-shard denominator lowers the ratio at fixed overhead),
        # so record both throughputs alongside it
        "edges_per_s_1dev": round(eps1),
        "edges_per_s_full_mesh": round(epsp),
        "n_devices": p,
    }))


if __name__ == "__main__":
    main()
