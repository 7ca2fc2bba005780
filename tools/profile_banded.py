"""Attribute the banded round body's per-round cost: each op group runs
inside a 10-iteration fori_loop (one executable, chained data deps), so
the per-iteration number reflects in-while_loop steady state without the
~5 ms per-dispatch tunnel overhead that poisons standalone timings.

Usage: python tools/profile_banded.py [n] [M]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 10


def timeit(fn, name, reps=3):
    import jax
    keys = [jax.random.PRNGKey(5000 + i) for i in range(reps + 1)]
    t0 = time.perf_counter()
    jax.block_until_ready(fn(keys[0]))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(k) for k in keys[1:]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps / ITERS * 1e3
    print(f"{name:50s} {dt:8.3f} ms/iter (compile {c:.0f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rlap_tpu.ops.rlap import (_last_le_lookup, _segmented_cumsum,
                                   _segmented_maxscan_rev)
    from rlap_tpu.utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 245760
    print(f"devices: {jax.devices()} n={n} M={M}", flush=True)

    key0 = jax.random.PRNGKey(0)
    s0 = jax.random.randint(key0, (M,), 0, n).astype(jnp.int32)
    r0 = jax.random.randint(jax.random.fold_in(key0, 1), (M,), 0,
                            n).astype(jnp.int32)

    def loop(group):
        """group: (i, s, r, w) -> array whose first element feeds back."""
        def run(key):
            w = jax.random.uniform(key, (M,))

            def body(i, carry):
                wc, acc = carry
                out = group(i, s0, r0, wc)
                return wc * 0.999 + out[0] * 1e-9, acc + out[0]

            wf, acc = jax.lax.fori_loop(0, ITERS, body,
                                        (w, jnp.zeros((), w.dtype)))
            return acc + wf[0]

        return jax.jit(run)

    t1 = jnp.ones((1,), bool)

    def g_deg(i, s, r, w):
        sr = jnp.concatenate([s, r])
        live2 = jnp.concatenate([w > 0, w > 0])
        deg = jnp.zeros((n + 1,), jnp.int32).at[sr].add(live2.astype(jnp.int32))
        return deg.astype(w.dtype)

    timeit(loop(g_deg), "deg scatter-add 2M -> n")

    def g_luby1(i, s, r, w):
        sr = jnp.concatenate([s, r])
        rs = jnp.concatenate([r, s])
        live2 = jnp.concatenate([w > 0, w > 0])
        pack_pad = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32) + i, jnp.zeros((1,), jnp.int32)])
        nbr2 = jnp.where(live2, pack_pad[rs], 1 << 30)
        nmin = jnp.full((n + 1,), 1 << 30, jnp.int32).at[sr].min(nbr2)
        return nmin.astype(w.dtype)

    timeit(loop(g_luby1), "1 Luby subiter (gather 2M + scatter-min 2M)")

    def g_eser(i, s, r, w):
        elim_pad = (jnp.arange(n + 1, dtype=jnp.int32) + i) % 7 == 0
        sr = jnp.concatenate([s, r])
        e2 = elim_pad[sr]
        return e2.astype(w.dtype)

    timeit(loop(g_eser), "es/er gather 2M")

    def g_rho_sort(i, s, r, w):
        ow, ot, ks, kr, wp = jax.lax.sort(
            (jnp.where(w > 0.5, s, 1 << 30), r, s, r, w), num_keys=2)
        return wp

    timeit(loop(g_rho_sort), "rho sort M (2 keys + 3 payloads)")

    def g_scans(i, s, r, w):
        heads = jnp.concatenate([t1, s[1:] != s[:-1]])
        cum = _segmented_cumsum(w, heads)
        csum = _segmented_maxscan_rev(cum, heads)
        return csum - cum

    timeit(loop(g_scans), "2 segmented scans M")

    def g_lookup(i, s, r, w):
        cum = jnp.cumsum(w)
        q = _last_le_lookup((s, cum), (s, cum * 0.99))
        return q.astype(w.dtype)

    timeit(loop(g_lookup), "_last_le_lookup M data + M query")

    def g_cls_sort(i, s, r, w):
        cls = (s + i) % 29
        out = jax.lax.sort((cls, s, r, w), num_keys=1)
        return out[3]

    timeit(loop(g_cls_sort), "class sort M (1 key + 3 payloads)")

    DT = 26
    DC = M // 2

    def g_flush(i, s, r, w):
        dest = jnp.minimum((s % DT) * DC + jnp.arange(M, dtype=jnp.int32),
                           DT * DC)
        a = jnp.zeros((DT * DC + 1,), jnp.int32).at[dest].set(s)
        b = jnp.zeros((DT * DC + 1,), jnp.int32).at[dest].set(r)
        c = jnp.zeros((DT * DC + 1,), w.dtype).at[dest].set(w)
        return (a[:M] + b[:M]).astype(w.dtype) + c[:M]

    timeit(loop(g_flush), "3 flush scatters M -> NW*DC")

    def g_linear(i, s, r, w):
        x = jnp.where(jnp.arange(n) % 2 == 0, i, 2 * i)
        for _ in range(10):
            x = x * 2 + 1
        return x.astype(w.dtype)

    timeit(loop(g_linear), "10 linear n-sized ops")


if __name__ == "__main__":
    main()
