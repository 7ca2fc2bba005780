"""Benchmark: rLap augmentation throughput (edges/s) on the TPU kernel vs
the sequential C++ oracle (the reference implementation's stand-in).

Prints ONE JSON line:
  {"metric": "rlap_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": ratio}
where the baseline is the single-thread sequential C++ engine (same
algorithm as the reference's `preconditioner.cc`) on this host's CPU.
All diagnostics go to stderr.

Default size: BA(n=100000, m=8), t=n/2 — the production-scale regime this
framework targets (1.6M directed edges; the TPU kernel's throughput is
nearly size-invariant while the sequential engine degrades once its
working set outgrows the CPU caches). `python bench.py 20000` reproduces
the small-graph point; both are recorded in BENCH_EXTRA.md. The oracle's
CPU time varies ~4x run to run on this shared host, so the baseline is a
median of 5.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.native import oracle_approximate_cholesky
    from rlap_tpu.ops.rlap import eliminate

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    m = 8
    frac = 0.5
    t = int(frac * n)

    log(f"devices: {jax.devices()}")
    g = barabasi_albert(n, m, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    log(f"BA(n={n}, m={m}): {e_live} directed edges, removing {t} nodes")

    mask = np.asarray(g.edge_mask)
    ei = np.stack([np.asarray(g.senders)[mask], np.asarray(g.receivers)[mask]])

    # --- baseline: sequential C++ engine on CPU (median of 5: this host's
    # CPU is shared and single-run times vary ~2x) ------------------------
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        oracle_approximate_cholesky(ei, None, n, t, o_v="random",
                                    o_n="random", seed=i)
        times.append(time.perf_counter() - t0)
    t_oracle = float(np.median(times))
    base_eps = e_live / t_oracle
    log(f"oracle (CPU, sequential): median {t_oracle:.3f}s of "
        f"{[round(x, 3) for x in times]} -> {base_eps:,.0f} edges/s")

    # --- TPU kernel ------------------------------------------------------
    d_cap = 512  # BA max degree grows ~ sqrt(n); 512 covers n=20k comfortably
    b_cap = min(t, 8192)
    key = jax.random.PRNGKey(0)

    def run(seed):
        out, removed, overflow = eliminate(
            g, jax.random.fold_in(key, seed), t,
            o_v="random", o_n="random", b_cap=b_cap, d_cap=d_cap)
        return out.weights.sum(), removed, overflow

    t0 = time.perf_counter()
    wsum, removed, overflow = jax.block_until_ready(run(0))
    log(f"first call (compile + run): {time.perf_counter() - t0:.1f}s; "
        f"removed={int(removed)} overflow={bool(overflow)}")
    if bool(overflow):
        log("WARNING: overflow at d_cap; escalate")

    reps = 5
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, overflow = run(i)
    jax.block_until_ready(wsum)
    dt = (time.perf_counter() - t0) / reps
    eps = e_live / dt
    log(f"kernel: {dt * 1e3:.1f} ms/call -> {eps:,.0f} edges/s "
        f"(removed {int(removed)}/{t})")

    # --- speed-of-light model (access-pattern roofline) ------------------
    # minimum wall time for this kernel's op schedule at exactly the
    # elements each op must touch, priced at the measured on-chip
    # primitive costs — see rlap_tpu/bench/roofline.py. The fraction says
    # how close the static-prefix kernel gets to its own ceiling.
    from rlap_tpu.bench.roofline import roofline_ms, schedule_ms

    model_ms, model = roofline_ms(n, m=m, frac=frac, seed=0)
    log(f"roofline (speed-of-light model): {model_ms:.1f} ms "
        f"({model['rounds']} rounds; breakdown "
        f"{ {k: round(v, 1) for k, v in model['breakdown_ms'].items()} })")
    sched = schedule_ms(n, model)
    log(f"implemented-schedule price: {sched['sched_ms']:.1f} ms "
        f"(static-prefix quantization over the ideal; residue vs measured "
        f"is per-op XLA overhead — see BENCH_EXTRA.md)")

    print(json.dumps({
        "metric": "rlap_edges_per_s",
        "value": round(eps),
        "unit": "edges/s",
        "vs_baseline": round(eps / base_eps, 3),
        # context: the baseline is the sequential C++ oracle on THIS
        # host right now (median of 5); it swings ~3x with host load
        # while the TPU kernel stays within ~7%, so vs_baseline moves
        # with the denominator — record it alongside
        "oracle_edges_per_s": round(base_eps),
        # fraction of the kernel's own access-pattern speed of light
        # (measured primitive costs x necessary element counts)
        "roofline_fraction": round(model_ms / (dt * 1e3), 3),
        "roofline_ms": round(model_ms, 1),
        # the same schedule priced at the kernel's actual static sizes
        # (stage prefixes + ladder rungs): how much of the roofline gap
        # is static-shape quantization vs per-op XLA overhead
        "sched_ms": round(sched["sched_ms"], 1),
        "sched_fraction": round(sched["sched_ms"] / (dt * 1e3), 3),
    }))


if __name__ == "__main__":
    main()
