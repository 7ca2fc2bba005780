"""A/B bench: banded vs staged elimination kernel on the live TPU.

Pipelined timing (enqueue all reps, one terminal sync) like bench.py.
Inputs vary per rep (the backend memoizes identical executions).

Usage: python tools/ab_banded.py [n] [window] [reps] [mode]
  n       graph size (BA(n, 8)), default 100000
  window  band window W (0 = auto from _band_params), default 0
  reps    reps per timing batch, default 5
  mode    "banded", "staged", or "both", default "banded"
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    mode = sys.argv[4] if len(sys.argv) > 4 else "banded"

    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import _band_params, eliminate

    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    e_half = g.senders.shape[0] // 2
    t = n // 2
    key = jax.random.PRNGKey(0)
    auto = _band_params(e_half, n)
    print(f"devices: {jax.devices()}  BA({n},8) e_live={e_live} t={t}",
          flush=True)
    print(f"auto (W, NW, C, SP, DC) = {auto}; override W={W or '-'}",
          flush=True)
    if W == 0 and auto is not None:
        W = auto[0]

    variants = []
    if mode in ("banded", "both"):
        variants.append(("banded", dict(window=W)))
    if mode in ("staged", "both"):
        variants.append(("staged", {}))

    for name, kw in variants:
        def run(seed):
            out, removed, overflow = eliminate(
                g, jax.random.fold_in(key, seed), t, **kw)
            return out.weights.sum(), removed, overflow

        t0 = time.perf_counter()
        wsum, removed, overflow = jax.block_until_ready(run(0))
        print(f"[{name}] first call {time.perf_counter()-t0:.1f}s "
              f"removed={int(removed)} overflow={bool(overflow)}",
              flush=True)

        for batch in range(3):
            t0 = time.perf_counter()
            for i in range(reps):
                wsum, removed, overflow = run(batch * reps + i + 1)
            jax.block_until_ready(wsum)
            dt = (time.perf_counter() - t0) / reps
            print(f"[{name}] batch {batch}: {dt*1e3:.1f} ms/call -> "
                  f"{e_live/dt:,.0f} edges/s removed={int(removed)} "
                  f"ovf={bool(overflow)}", flush=True)


if __name__ == "__main__":
    main()
