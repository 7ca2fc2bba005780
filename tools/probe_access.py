"""Probe random-access primitive costs on the live TPU.

The staged elimination kernel's round body is dominated by vertex-table
random access (~16 gathers/scatter-mins per round at ~7 cycles/element,
BENCH_EXTRA.md). This probe measures, on the real chip, every candidate
replacement before any kernel rewrite:

  A. XLA gather from an n-table, random vs sorted indices, with and
     without `indices_are_sorted`.
  B. XLA scatter-add / scatter-min, random vs sorted indices, with and
     without sortedness/uniqueness hints.
  C. Pallas (Mosaic) per-element VMEM-table gather: (1) vectorized
     `jnp.take` inside a kernel, (2) scalar fori_loop loads,
     (3) one-hot-matmul gather over 128-wide table chunks.
  D. XLA sort costs at pool width for calibration.

Usage: python tools/probe_access.py [n] [E] [reps]
Defaults n=100_000 (vertex-table size at the production bench shape),
E=1_600_000 (2 * e_half directed endpoint ids at BA(100k, m=8)).
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, make_args, reps, name):
    """Pipelined timing with per-rep fresh inputs (the axon backend
    memoizes identical executions) and one terminal sync."""
    import jax

    outs = [fn(*make_args(0))]
    jax.block_until_ready(outs)  # compile
    t0 = time.perf_counter()
    outs = [fn(*make_args(i + 1)) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    import jax.numpy as jnp
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    dev = jax.devices()[0]
    print(f"device: {dev} n={n} E={E} reps={reps}", flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.device_put(jax.random.normal(key, (n,), jnp.float32))
    tablei = jax.device_put(
        jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32))

    def mk_idx(seed, sort=False):
        k = jax.random.fold_in(key, seed)
        idx = jax.random.randint(k, (E,), 0, n, jnp.int32)
        if sort:
            idx = jnp.sort(idx)
        return jax.device_put(idx)

    def mk_vals(seed):
        return jax.device_put(
            jax.random.normal(jax.random.fold_in(key, seed + 777),
                              (E,), jnp.float32))

    # ---- A. XLA gathers ---------------------------------------------------
    @jax.jit
    def g_plain(idx):
        return tablei[idx]

    @jax.jit
    def g_sorted_hint(idx):
        return jnp.take(tablei, idx, indices_are_sorted=True)

    timeit(g_plain, lambda i: (mk_idx(i),), reps, "A1 gather random idx")
    timeit(g_plain, lambda i: (mk_idx(i, True),), reps,
           "A2 gather sorted idx (no hint)")
    timeit(g_sorted_hint, lambda i: (mk_idx(i, True),), reps,
           "A3 gather sorted idx + indices_are_sorted")

    # ---- B. XLA scatters --------------------------------------------------
    @jax.jit
    def s_add(idx, vals):
        return jnp.zeros((n,), jnp.float32).at[idx].add(vals)

    @jax.jit
    def s_min(idx, vals):
        return jnp.full((n,), jnp.inf, jnp.float32).at[idx].min(vals)

    @jax.jit
    def s_add_sorted(idx, vals):
        return jnp.zeros((n,), jnp.float32).at[idx].add(
            vals, indices_are_sorted=True)

    @jax.jit
    def seg_sum(idx, vals):
        return jax.ops.segment_sum(vals, idx, num_segments=n,
                                   indices_are_sorted=True)

    timeit(s_add, lambda i: (mk_idx(i), mk_vals(i)), reps,
           "B1 scatter-add random idx")
    timeit(s_min, lambda i: (mk_idx(i), mk_vals(i)), reps,
           "B2 scatter-min random idx")
    timeit(s_add_sorted, lambda i: (mk_idx(i, True), mk_vals(i)), reps,
           "B3 scatter-add sorted idx + hint")
    timeit(seg_sum, lambda i: (mk_idx(i, True), mk_vals(i)), reps,
           "B4 segment_sum sorted idx + hint")

    # ---- D. sort calibration ----------------------------------------------
    @jax.jit
    def sort3(k1, p1, p2):
        return jax.lax.sort((k1, p1, p2), num_keys=1)

    timeit(sort3, lambda i: (mk_idx(i), mk_idx(i + 1), mk_vals(i)), reps,
           "D1 sort E elems 1 key + 2 payloads")

    # ---- C. Pallas VMEM-table gathers --------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NT = ((n + 127) // 128) * 128
    tpad = jnp.pad(tablei, (0, NT - n))
    TILE = 8192

    # C1: vectorized take inside the kernel (whole table VMEM-resident,
    # index tiles streamed by the grid)
    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pallas_take(idx):
        return pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((E,), jnp.int32),
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((NT,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(tpad, idx)

    try:
        r = pallas_take(mk_idx(0))
        ref = g_plain(mk_idx(0))
        ok = bool(jnp.all(r == ref))
        print(f"C1 pallas take compiles, correct={ok}", flush=True)
        timeit(pallas_take, lambda i: (mk_idx(i),), reps,
               "C1 pallas vectorized take (VMEM table)")
    except Exception as e:  # noqa: BLE001
        print(f"C1 pallas take FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # C2: 2D take_along_axis flavor — table as (rows, 128), gather row
    # blocks then lane-select. Probes the lane-local path.
    R_ = NT // 128
    tab2d = tpad.reshape(R_, 128)

    def k_tala(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        rows = idx // 128
        lanes = idx % 128
        # gather rows via take (sublane gather), then lane-local select
        sel = jnp.take(tab_ref[:], rows, axis=0)  # (TILE, 128)
        out_ref[:] = jnp.take_along_axis(
            sel, lanes[:, None], axis=1)[:, 0]

    @jax.jit
    def pallas_tala(idx):
        return pl.pallas_call(
            k_tala,
            out_shape=jax.ShapeDtypeStruct((E,), jnp.int32),
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((R_, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(tab2d, idx)

    try:
        r = pallas_tala(mk_idx(0))
        ref = g_plain(mk_idx(0))
        ok = bool(jnp.all(r == ref))
        print(f"C2 pallas row-take + lane-select compiles, correct={ok}",
              flush=True)
        timeit(pallas_tala, lambda i: (mk_idx(i),), reps,
               "C2 pallas 2-level take (VMEM table)")
    except Exception as e:  # noqa: BLE001
        print(f"C2 pallas 2-level FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # C3: scalar fori_loop loads — the floor for per-element addressing
    def k_scalar(tab_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[i] = tab_ref[idx_ref[i]]
            return 0
        jax.lax.fori_loop(0, TILE, body, 0)

    @jax.jit
    def pallas_scalar(idx):
        return pl.pallas_call(
            k_scalar,
            out_shape=jax.ShapeDtypeStruct((TILE,), jnp.int32),
            in_specs=[
                pl.BlockSpec((NT,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), memory_space=pltpu.VMEM),
        )(tpad, idx)

    try:
        idx0 = mk_idx(0)[:TILE]
        r = pallas_scalar(idx0)
        ok = bool(jnp.all(r == tablei[idx0]))
        print(f"C3 pallas scalar loop compiles, correct={ok}", flush=True)
        dt = timeit(pallas_scalar, lambda i: (mk_idx(i)[:TILE],), 3,
                    f"C3 pallas scalar loop ({TILE} elems)")
        print(f"   -> scaled to E: {dt * E / TILE * 1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"C3 pallas scalar FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # C4: Pallas scatter-min into VMEM table (read-modify-write semantics)
    def k_smin(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, 2**30)
        idx = idx_ref[:]
        cur = jnp.take(out_ref[:], idx, axis=0)
        upd = jnp.minimum(cur, val_ref[:])
        # vectorized scatter attempt
        tab = out_ref[:]
        out_ref[:] = tab.at[idx].min(val_ref[:])

    @jax.jit
    def pallas_smin(idx, vals):
        return pl.pallas_call(
            k_smin,
            out_shape=jax.ShapeDtypeStruct((NT,), jnp.int32),
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NT,), lambda i: (0,),
                                   memory_space=pltpu.VMEM),
        )(idx, vals)

    try:
        ival = jax.random.randint(key, (E,), 0, 1 << 20, jnp.int32)
        r = pallas_smin(mk_idx(0), ival)
        ref = jnp.full((NT,), 2**30, jnp.int32).at[mk_idx(0)].min(ival)
        ok = bool(jnp.all(r == ref))
        print(f"C4 pallas scatter-min compiles, correct={ok}", flush=True)
        timeit(pallas_smin, lambda i: (mk_idx(i), ival), reps,
               "C4 pallas scatter-min (VMEM table)")
    except Exception as e:  # noqa: BLE001
        print(f"C4 pallas scatter-min FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
