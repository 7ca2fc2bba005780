"""Quick sanity bench (v2): time the rLap kernel with a forced value fetch each
rep (guards against async remote backends where block_until_ready may not
actually synchronize)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import eliminate

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    t = n // 2
    g = barabasi_albert(n, 8, seed=0)
    e_live = int(np.asarray(g.edge_mask).sum())
    print(f"devices: {jax.devices()}, edges={e_live}", flush=True)
    key = jax.random.PRNGKey(0)

    import functools
    import jax.numpy as jnp
    from rlap_tpu.ops.rlap import _eliminate_impl_fast
    from rlap_tpu.core import graph as G
    gg = G.drop_zero_weight(G.coalesce(G.remove_self_loops(g)))
    f = jax.jit(functools.partial(
        _eliminate_impl_fast, n=n, o_v="random", schedule="fast"))

    def run(seed):
        s, r, w, removed, rounds, overflow = f(
            gg.senders, gg.receivers, gg.weights,
            jax.random.fold_in(key, seed), t)
        return w.sum(), removed, rounds

    t0 = time.perf_counter()
    wsum, removed, rounds = run(0)
    wsum_v, removed_v = float(wsum), int(removed)
    print(f"first call (compile+run+fetch): {time.perf_counter()-t0:.1f}s "
          f"wsum={wsum_v:.2f} removed={removed_v} rounds={int(rounds)}", flush=True)

    # timed with per-rep fetch
    reps = 5
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, rounds = run(i)
        wsum_v = float(wsum)
    dt = (time.perf_counter() - t0) / reps
    print(f"per-call (with fetch): {dt*1e3:.1f} ms -> "
          f"{e_live/dt:,.0f} edges/s (removed={int(removed)})", flush=True)

    # timed with only block_until_ready (the round-1 bench pattern)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, rounds = run(i)
    jax.block_until_ready(wsum)
    dt2 = (time.perf_counter() - t0) / reps
    print(f"per-call (block only):  {dt2*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
