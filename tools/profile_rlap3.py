"""Profile v3: round-body variants to attribute per-round cost, plus the
primitives the v3 kernel design needs (scatter-add/min, merge-based
searchsorted, batched sort). Cache-busted via fresh keys per rep."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def timeit(fn, reps=5, name=""):
    import jax
    keys = [jax.random.PRNGKey(2000 + i) for i in range(reps + 1)]
    t0 = time.perf_counter()
    jax.block_until_ready(fn(keys[0]))
    log(f"{name:45s} compile {time.perf_counter()-t0:6.1f}s", )
    t0 = time.perf_counter()
    outs = [fn(k) for k in keys[1:]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:45s} {dt:10.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rlap_tpu.data.synthetic import barabasi_albert

    n = 20000
    g = barabasi_albert(n, 8, seed=0)
    e_cap = g.edge_capacity
    h_cap = e_cap // 2
    B = n + 1
    log(f"devices: {jax.devices()}, e_cap={e_cap}, h_cap={h_cap}")

    s0, r0, w0 = g.senders, g.receivers, g.weights
    su, ru, wu = s0[:h_cap], r0[:h_cap], w0[:h_cap]  # half-size stand-ins

    def fresh(key, m=e_cap):
        return jax.random.uniform(key, (m,), dtype=jnp.float32)

    # --- scatters (half size, the canonical-pool selection path) ---------
    @jax.jit
    def p_scatter_add(key):
        w = fresh(key, h_cap)
        return jnp.zeros((n + 1,), jnp.float32).at[su].add(w)[0]

    timeit(p_scatter_add, name="scatter-add h_cap->n")

    @jax.jit
    def p_scatter_min(key):
        w = fresh(key, h_cap)
        return jnp.full((n + 1,), 1e9, jnp.float32).at[su].min(w)[0]

    timeit(p_scatter_min, name="scatter-min h_cap->n")

    @jax.jit
    def p_gather_h(key):
        w = fresh(key, h_cap)
        i = jax.random.randint(key, (h_cap,), 0, h_cap)
        return w[i][0]

    timeit(p_gather_h, name="1 gather h_cap->h_cap")

    @jax.jit
    def p_gather_nh(key):
        """n-array gathered at h_cap edge positions (deg[s] pattern)."""
        w = fresh(key, n + 1)
        return w[su][0]

    timeit(p_gather_nh, name="1 gather n->h_cap")

    # --- merge-based searchsorted: rank queries in data via one sort ------
    @jax.jit
    def p_merge_search(key):
        w = fresh(key, h_cap)
        cum = jnp.cumsum(w)
        q = fresh(jax.random.fold_in(key, 1), h_cap) * cum[-1]
        # tag: data=0, query=1; key = value, tie -> data first
        vals = jnp.concatenate([cum, q])
        tag = jnp.concatenate([jnp.zeros((h_cap,), jnp.int32),
                               jnp.ones((h_cap,), jnp.int32)])
        pos = jnp.concatenate([jnp.zeros((h_cap,), jnp.int32),
                               jnp.arange(h_cap, dtype=jnp.int32)])
        sv, st, sp = jax.lax.sort((vals, tag, pos), num_keys=2)
        rank = jnp.cumsum(1 - st)  # data items seen so far (inclusive)
        # scatter ranks back to query slots
        out = jnp.zeros((h_cap,), jnp.int32).at[jnp.where(
            st == 1, sp, h_cap - 1)].max(rank)
        return out[0]

    timeit(p_merge_search, name="merge-searchsorted h_cap (sort+scan+scat)")

    # --- sorts at half size and batched ----------------------------------
    @jax.jit
    def p_sort_h(key):
        w = fresh(key, h_cap)
        kappa = su * B + ru
        kappa, w = jax.lax.sort((kappa, w), num_keys=1)
        return kappa[0] + w[0]

    timeit(p_sort_h, name="fused sort h_cap (+1 payload)")

    @jax.jit
    def p_sort_h3(key):
        w = fresh(key, h_cap)
        kappa = su * B + ru
        kappa, w, i1, i2 = jax.lax.sort(
            (kappa, w, ru, su), num_keys=1)
        return kappa[0] + w[0] + i1[0] + i2[0]

    timeit(p_sort_h3, name="fused sort h_cap (+3 payloads)")

    @jax.jit
    def p_sort_batched(key):
        w = fresh(key, 4 * h_cap).reshape(4, h_cap)
        k4 = jnp.broadcast_to(su * B + ru, (4, h_cap))
        kappa, w = jax.lax.sort((k4, w), num_keys=1, dimension=1)
        return kappa[0, 0] + w[0, 0]

    timeit(p_sort_batched, name="batched [4, h_cap] sort (+1 payload)")

    # --- scans at half size ----------------------------------------------
    from rlap_tpu.ops.rlap import _segmented_cumsum

    @jax.jit
    def p_scan_h(key):
        w = fresh(key, h_cap)
        heads = jnp.concatenate([jnp.ones((1,), bool), su[1:] != su[:-1]])
        return _segmented_cumsum(w, heads)[-1]

    timeit(p_scan_h, name="segmented cumsum h_cap")

    # --- 12-step windowed search at h_cap ---------------------------------
    from rlap_tpu.ops.rlap import _batched_searchsorted_window

    @jax.jit
    def p_search12(key):
        w = fresh(key, h_cap)
        c = jnp.cumsum(w)
        idx = jnp.arange(h_cap, dtype=jnp.int32)
        lo = jnp.maximum(idx - 2048, 0)
        hi = jnp.minimum(idx + 2048, h_cap)
        return _batched_searchsorted_window(c, w * 3, lo, hi, 12)[0]

    timeit(p_search12, name="12-step windowed search h_cap")


if __name__ == "__main__":
    main()
