"""A/B bench for elimination-kernel variants on the live TPU.

Pipelined timing (enqueue all reps, one terminal sync) exactly like
bench.py — per-call host syncs over the axon tunnel add ~10-15 ms/call and
drown real differences. Inputs vary per rep (the backend memoizes identical
executions).

Usage: python tools/ab_bench.py [divisors like 4,16] [subiters] [reps]
"""

import sys
import time

import numpy as np


def main():
    divs = tuple(int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                  else "4,16").split(",") if x)
    sub_arg = sys.argv[2] if len(sys.argv) > 2 else "3"
    subiters = (tuple(int(x) for x in sub_arg.split(":"))
                if ":" in sub_arg else int(sub_arg))
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.ops import rlap as R

    def stage_sizes(e_cap):
        sizes = [e_cap]
        for d in divs:
            p = max(16384, ((e_cap + d - 1) // d + 1023) // 1024 * 1024)
            if p < sizes[-1]:
                sizes.append(p)
        return tuple(sizes)

    R._stage_sizes = stage_sizes

    from rlap_tpu.data.synthetic import barabasi_albert
    g = barabasi_albert(20000, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()} divisors={divs} subiters={subiters}",
          flush=True)
    print(f"stages: {stage_sizes(g.senders.shape[0])}", flush=True)

    def run(seed):
        out, removed, overflow = R.eliminate(
            g, jax.random.fold_in(key, seed), 10000, subiters=subiters)
        return out.weights.sum(), removed, overflow

    t0 = time.perf_counter()
    wsum, removed, overflow = jax.block_until_ready(run(0))
    print(f"first call {time.perf_counter()-t0:.1f}s removed={int(removed)} "
          f"overflow={bool(overflow)}", flush=True)

    for batch in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            wsum, removed, overflow = run(batch * reps + i + 1)
        jax.block_until_ready(wsum)
        dt = (time.perf_counter() - t0) / reps
        print(f"batch {batch}: {dt*1e3:.1f} ms/call -> "
              f"{e_live/dt:,.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
