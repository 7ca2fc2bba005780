"""A/B bench: windowed vs staged elimination kernel on the live TPU.

Pipelined timing (enqueue all reps, one terminal sync) exactly like
bench.py — per-call host syncs over the axon tunnel add ~10-15 ms/call and
drown real differences. Inputs vary per rep (the backend memoizes
identical executions).

Usage: python tools/ab_window.py [n] [window] [active_cap] [reps] [mode]
  n          graph size (BA(n, 8)), default 20000
  window     window step W (0 = auto), default 0
  active_cap active prefix A (0 = auto), default 0
  reps       reps per timing batch, default 10
  mode       "win" (windowed), "staged", or "both", default "win"
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    A = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    mode = sys.argv[5] if len(sys.argv) > 5 else "win"

    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import _window_params, eliminate

    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    e_half = g.senders.shape[0] // 2
    t = n // 2
    key = jax.random.PRNGKey(0)
    auto = _window_params(e_half, n, g.senders.shape[0])
    print(f"devices: {jax.devices()}  BA({n},8) e_live={e_live} t={t}",
          flush=True)
    print(f"auto (W, A) = {auto}; override W={W or '-'} A={A or '-'}",
          flush=True)

    variants = []
    if mode in ("win", "both"):
        variants.append(("windowed", dict(window=W or None,
                                          active_cap=A or None)))
    if mode in ("staged", "both"):
        variants.append(("staged", dict(compact=False)))

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
                  f"{e_live/dt:,.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
