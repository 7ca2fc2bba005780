"""Profile v2: every timed call gets FRESH inputs derived from a per-rep
PRNG key (the axon remote backend memoizes identical (executable, args)
executions, so same-args timing is bogus).

Times the fast-path round body and its component groups at bench size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def timeit(fn, reps=5, name=""):
    """fn: key -> array(s). Compiles on one key, times on fresh keys."""
    import jax
    keys = [jax.random.PRNGKey(1000 + i) for i in range(reps + 1)]
    jax.block_until_ready(fn(keys[0]))  # compile
    t0 = time.perf_counter()
    outs = [fn(k) for k in keys[1:]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:45s} {dt:10.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import functools

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import (_segmented_cumsum, _segmented_minscan,
                                   _batched_searchsorted_window,
                                   _eliminate_impl_fast)

    n = 20000
    g = barabasi_albert(n, 8, seed=0)
    e_cap = g.edge_capacity
    B = n + 1
    steps = int(np.ceil(np.log2(e_cap + 1)))
    log(f"devices: {jax.devices()}, e_cap={e_cap}, steps={steps}")

    s0, r0, w0 = g.senders, g.receivers, g.weights

    def fresh(key):
        """Perturb weights so inputs differ per rep (cache-busting)."""
        u = jax.random.uniform(key, (e_cap,), dtype=w0.dtype)
        return w0 + u * 1e-3

    # --- primitives, cache-busted ---------------------------------------
    @jax.jit
    def p_sort(key):
        w = fresh(key)
        kappa = s0 * B + r0
        kappa, w = jax.lax.sort((kappa, w), num_keys=1)
        return kappa[0] + w[0]

    timeit(p_sort, name="fused-key sort (+datagen)")

    @jax.jit
    def p_sort3(key):
        w = fresh(key)
        o = jnp.lexsort((r0, w, s0))
        return o[0]

    timeit(p_sort3, name="lexsort 3-key (+datagen)")

    @jax.jit
    def p_scan(key):
        w = fresh(key)
        heads = jnp.concatenate([jnp.ones((1,), bool), s0[1:] != s0[:-1]])
        c = _segmented_cumsum(w, heads)
        return c[-1]

    timeit(p_scan, name="segmented cumsum (+datagen)")

    @jax.jit
    def p_cumsum(key):
        w = fresh(key)
        return jnp.cumsum(w)[-1]

    timeit(p_cumsum, name="plain cumsum (+datagen)")

    @jax.jit
    def p_search(key):
        w = fresh(key)
        c = jnp.cumsum(w)
        idx = jnp.arange(e_cap, dtype=jnp.int32)
        lo = jnp.maximum(idx - 64, 0)
        hi = jnp.minimum(idx + 64, e_cap)
        q = _batched_searchsorted_window(c, w * 3.0, lo, hi, steps)
        return q[0]

    timeit(p_search, name=f"binary search {steps} steps (+datagen)")

    @jax.jit
    def p_gather(key):
        w = fresh(key)
        i = jax.random.randint(key, (e_cap,), 0, e_cap)
        return w[i][0]

    timeit(p_gather, name="1 gather e_cap->e_cap (+datagen)")

    @jax.jit
    def p_gather8(key):
        w = fresh(key)
        i = jax.random.randint(key, (e_cap,), 0, e_cap)
        x = w
        for k in range(8):
            x = x[(i + k) % e_cap]
        return x[0]

    timeit(p_gather8, name="8 chained gathers (+datagen)")

    @jax.jit
    def p_searchsorted_n(key):
        w = fresh(key)
        return jnp.searchsorted(
            s0, jnp.arange(n + 2, dtype=jnp.int32), side="left")[0] + w[0]

    timeit(p_searchsorted_n, name="searchsorted n+2 over e_cap (+datagen)")

    @jax.jit
    def p_segsum(key):
        w = fresh(key)
        return jax.ops.segment_sum(w, s0, num_segments=n + 1)[0]

    timeit(p_segsum, name="segment_sum e_cap->n (+datagen)")

    @jax.jit
    def p_minscan(key):
        w = fresh(key)
        heads = jnp.concatenate([jnp.ones((1,), bool), s0[1:] != s0[:-1]])
        c = _segmented_minscan((w * 1e6).astype(jnp.int32), heads)
        return c[-1]

    timeit(p_minscan, name="segmented min-scan int (+datagen)")

    @jax.jit
    def p_sort_n(key):
        x = jax.random.randint(key, (n,), 0, 1 << 30)
        return jnp.sort(x)[0]

    timeit(p_sort_n, name="sort n=20k int (+datagen)")

    # --- fixed-round-count fast kernel -----------------------------------
    t = n // 2
    f = jax.jit(functools.partial(
        _eliminate_impl_fast, n=n, o_v="random", schedule="fast"))

    def full(key):
        s, r, w, removed, rounds = f(s0, r0, w0, key, t)
        return w.sum(), removed, rounds

    out = jax.block_until_ready(full(jax.random.PRNGKey(7)))
    log(f"fast kernel: removed={int(out[1])} rounds={int(out[2])}")
    dt = timeit(lambda k: full(k)[0], reps=3, name="fast kernel full")
    log(f"per-round: {dt / max(int(out[2]), 1):.2f} ms over {int(out[2])} rounds")


if __name__ == "__main__":
    main()
