"""Profile the rLap round-body primitives on the real TPU.

Times each primitive of the round body in isolation (lexsort, 1-key sort,
segmented scan, windowed binary search, coalesce, segment ops) at the bench
size (e_cap ~= 320k), plus the full kernel and its round count. Run on axon:

    python tools/profile_rlap.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=5, name=""):
    import jax
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:45s} {dt:10.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.ops.rlap import (_segmented_cumsum,
                                   _batched_searchsorted_window, eliminate)
    from rlap_tpu.core import graph as G

    n = 20000
    g = barabasi_albert(n, 8, seed=0)
    e_cap = g.edge_capacity
    log(f"devices: {jax.devices()}, e_cap={e_cap}")

    key = jax.random.PRNGKey(0)
    s = g.senders
    r = g.receivers
    w = g.weights
    k2 = jax.random.uniform(key, (e_cap,), dtype=jnp.float32)

    # --- primitives -----------------------------------------------------
    timeit(jax.jit(lambda s, r, k2: jnp.lexsort((r, k2, s))), s, r, k2,
           name="lexsort 3-key (e_cap)")
    timeit(jax.jit(lambda s: jnp.sort(s)), s, name="sort 1-key int32 (e_cap)")
    timeit(jax.jit(lambda s, w: jax.lax.sort((s, w), num_keys=1)), s, w,
           name="sort 1-key +1 payload")
    timeit(jax.jit(lambda s, r, w, k2: jax.lax.sort((s, k2, r, w),
                                                    num_keys=3)),
           s, r, w, k2, name="lax.sort 3-key +1 payload")
    heads = jax.jit(lambda s: jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]))(s)
    timeit(jax.jit(_segmented_cumsum), w, heads, name="segmented cumsum")
    cum = _segmented_cumsum(w, heads)
    idx = jnp.arange(e_cap, dtype=jnp.int32)
    lo = jnp.maximum(idx - 16, 0)
    hi = jnp.minimum(idx + 16, e_cap)
    steps = int(np.ceil(np.log2(e_cap + 1)))
    timeit(jax.jit(lambda c, q, lo, hi: _batched_searchsorted_window(
        c, q, lo, hi, steps)), cum, w, lo, hi,
        name=f"binary search ({steps} steps)")
    timeit(jax.jit(lambda g: G.coalesce(g).weights), g, name="coalesce")
    timeit(jax.jit(lambda w, s: jax.ops.segment_sum(
        w, s, num_segments=n + 1)), w, s, name="segment_sum -> n")
    timeit(jax.jit(lambda w, s: jax.ops.segment_min(
        w, s, num_segments=n + 1)), w, s, name="segment_min -> n")
    # gather e_cap from n
    deg = jax.ops.segment_sum(jnp.ones_like(s), s, num_segments=n + 1)
    timeit(jax.jit(lambda deg, s: deg[s]), deg, s, name="gather n -> e_cap")
    timeit(jax.jit(lambda cum, idx: cum[idx]), cum, idx,
           name="gather e_cap -> e_cap")
    # scatter-add e_cap -> e_cap (coalesce internals)
    pos = jnp.cumsum(heads.astype(jnp.int32)) - 1
    timeit(jax.jit(lambda w, pos: jnp.zeros(
        (e_cap,), w.dtype).at[pos].add(w)), w, pos,
        name="scatter-add e_cap -> e_cap")

    # --- full kernel + round count ---------------------------------------
    t = n // 2

    def run(seed):
        out, removed, overflow = eliminate(
            g, jax.random.fold_in(key, seed), t, o_v="random", o_n="random")
        return out.weights.sum(), removed

    t0 = time.perf_counter()
    out = jax.block_until_ready(run(0))
    log(f"full kernel first call (compile+run): {time.perf_counter()-t0:.1f}s")
    timeit(run, 1, reps=3, name="full kernel")

    # round count: call _eliminate_impl directly to get rounds
    from rlap_tpu.ops.rlap import _eliminate_impl
    import functools
    f = jax.jit(functools.partial(
        _eliminate_impl, n=n, o_v="random", o_n="random", schedule="fast"))
    gg = G.drop_zero_weight(G.coalesce(G.remove_self_loops(g)))
    _, _, _, removed, rounds = jax.block_until_ready(
        f(gg.senders, gg.receivers, gg.weights, key, t))
    log(f"rounds={int(rounds)} removed={int(removed)} (t={t})")


if __name__ == "__main__":
    main()
