"""A/B the selection/touched ladder grids on the live TPU.

The quantized-roofline decomposition (tools/quantized_roofline.py) puts
~44 ms of the BA(100k) gap in selection-rung overshoot and ~17 ms in the
pipeline rung; finer geometric grids shrink the overshoot at more
compile time. This drives rlap with patched _SEL_LADDER/_ET_LADDER.

Usage: python tools/ab_ladder.py [n] [sel_ladder] [et_ladder] [reps]
  e.g. python tools/ab_ladder.py 100000 64,32,16,8,4,2,1 16,4,1 5
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    sel = tuple(int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                                 else "64,16,4,2,1").split(","))
    etl = tuple(int(x) for x in (sys.argv[3] if len(sys.argv) > 3
                                 else "16,4,1").split(","))
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax
    import numpy as np
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    import rlap_tpu.ops.rlap as R
    R._SEL_LADDER = sel
    R._ET_LADDER = etl

    from rlap_tpu.data.synthetic import barabasi_albert
    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    t = n // 2

    def run(seed):
        out, removed, ovf = R.eliminate(g, jax.random.PRNGKey(seed), t)
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
        print(f"sel={sel} et={etl}: {dt*1e3:.1f} ms/call -> "
              f"{e_live/dt:,.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
