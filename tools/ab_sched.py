"""A/B the class-partitioned kernel's schedule knobs on the live TPU.

Usage: python tools/ab_sched.py [n] [et_fracs] [b_frac] [subiters] [reps]
  e.g. python tools/ab_sched.py 20000 4,4,2 0.3 3 8
"""

import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    fr = tuple(int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                                else "4,2").split(","))
    bf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    sub_s = sys.argv[4] if len(sys.argv) > 4 else "3"
    sub = (int(sub_s) if "," not in sub_s
           else tuple(int(x) for x in sub_s.split(",")))
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    import jax
    import numpy as np
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    import rlap_tpu.ops.rlap as R
    R._ET_FRACS = fr[:-1] if len(fr) > 1 else fr
    R._ET_FRAC_LAST = fr[-1]
    R._B_FRAC = bf

    from rlap_tpu.data.synthetic import barabasi_albert
    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    t = n // 2

    def run(seed):
        out, removed, ovf = R.eliminate(g, jax.random.PRNGKey(seed), t,
                                        subiters=sub)
        return out.weights.sum(), removed, ovf

    t0 = time.perf_counter()
    w, removed, ovf = jax.block_until_ready(run(0))
    print(f"first {time.perf_counter()-t0:.1f}s removed={int(removed)} "
          f"overflow={bool(ovf)}", flush=True)
    for batch in range(2):
        t0 = time.perf_counter()
        outs = [run(batch * reps + i + 1) for i in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"et={fr} b={bf} sub={sub}: {dt*1e3:.1f} ms/call -> "
              f"{e_live/dt:,.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
