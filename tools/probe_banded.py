"""Probe the banded kernel's static-cap usage at production scale.

Calls `_eliminate_impl_banded` directly (same preprocessing as
`eliminate`) so the diag dict (kc_max, dcur_max, ocur) comes back with
removed/rounds/overflow, then times pipelined reps.

Usage: python tools/probe_banded.py [n] [W] [C] [SP] [DC] [reps]
  All caps 0 = the kernel's auto schedule for that W.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    SP = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    DC = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 5

    import functools

    import jax

    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.core import graph as G
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import _band_params, _eliminate_impl_banded

    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    t = n // 2
    auto = _band_params(g.senders.shape[0] // 2, n)
    print(f"devices: {jax.devices()} BA({n},8) e_live={e_live} t={t} "
          f"auto={auto}", flush=True)
    if W == 0:
        W = auto[0]
    win = (W, C, SP, DC) if C else W
    print(f"window spec: {win}", flush=True)

    @functools.partial(jax.jit, static_argnames=("window",))
    def run(g, key, window):
        gg = G.remove_self_loops(g)
        gg = G.coalesce_fast(gg)
        gg = G.drop_zero_weight(gg)
        s, r, w, removed, rounds, overflow, diag = _eliminate_impl_banded(
            gg.senders, gg.receivers, gg.weights, key,
            jnp_t, n=g.num_nodes, window=window)
        return (w.sum(), removed, rounds, overflow, diag)

    import jax.numpy as jnp
    jnp_t = jnp.asarray(t, jnp.int32)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(g, key, win))
    wsum, removed, rounds, overflow, diag = out
    print(f"first call {time.perf_counter()-t0:.1f}s removed={int(removed)}"
          f" rounds={int(rounds)} ovf={bool(overflow)} "
          f"kc_max={int(diag['kc_max'])} dcur_max={int(diag['dcur_max'])} "
          f"ocur={int(diag['ocur'])}", flush=True)

    for batch in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            out = run(g, jax.random.fold_in(key, batch * reps + i + 1), win)
        out = jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        wsum, removed, rounds, overflow, diag = out
        print(f"batch {batch}: {dt*1e3:.1f} ms/call -> {e_live/dt:,.0f} e/s"
              f" removed={int(removed)} rounds={int(rounds)} "
              f"ovf={bool(overflow)} kc_max={int(diag['kc_max'])} "
              f"dcur_max={int(diag['dcur_max'])} ocur={int(diag['ocur'])}",
              flush=True)


if __name__ == "__main__":
    main()
