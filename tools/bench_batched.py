"""Throughput of BATCHED independent eliminations (vmap over PRNG keys).

The GRACE recipe consumes two independent rLap views per epoch and sweep
workloads run many configs; batched elimination amortizes the round body's
fixed per-pass costs (sorts and scans batch sublinearly on TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    import functools
    import jax.numpy as jnp

    from rlap_tpu.core import graph as G
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import _eliminate_impl_fast

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    t = n // 2
    g = barabasi_albert(n, 8, seed=0)
    gg = G.drop_zero_weight(G.coalesce(G.remove_self_loops(g)))
    e_live = int(np.asarray(g.edge_mask).sum())
    print(f"devices: {jax.devices()}, edges={e_live}, batch={b}", flush=True)

    f = functools.partial(_eliminate_impl_fast, n=n, o_v="random",
                          schedule="fast")
    fb = jax.jit(jax.vmap(f, in_axes=(None, None, None, 0, None)))
    key = jax.random.PRNGKey(0)

    def run(seed):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, seed * 100 + i))(
            jnp.arange(b))
        s, r, w, removed, rounds, overflow = fb(
            gg.senders, gg.receivers, gg.weights, keys, t)
        return w.sum(), removed, rounds

    t0 = time.perf_counter()
    wsum, removed, rounds = run(0)
    print(f"first call: {time.perf_counter()-t0:.1f}s "
          f"removed={np.asarray(removed).tolist()} "
          f"rounds={np.asarray(rounds).tolist()}", flush=True)

    reps = 4
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        wsum, removed, rounds = run(i)
        _ = float(wsum)
    dt = (time.perf_counter() - t0) / reps
    print(f"batched x{b}: {dt*1e3:.1f} ms/call -> "
          f"{b*e_live/dt:,.0f} edges/s total "
          f"({dt*1e3/b:.1f} ms per view)", flush=True)


if __name__ == "__main__":
    main()
