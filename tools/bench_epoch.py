"""Full GRACE training-epoch benchmark at production scale (VERDICT r4
item 2): the system-level metric where on-device composition is the
point.

One epoch = 2 rLap topology views + feature masking + shared GCN encoder
+ projection head + fused (Pallas) InfoNCE + Adam update — every stage on
the chip. The reference composes the same pipeline through a
GPU->CPU->GPU round trip per augmentor call every epoch
(`node_shared.py:273-281`, `augmentor_benchmarks.py:88-90`), so its epoch
floor is bounded below by 2x the sequential CPU engine's elimination time
plus two PCIe round trips of the edge list.

Variants:
  separate : the recipe default — aug1(g, k1), aug2(g, k2), two
             `eliminate` dispatches
  paired   : `PairedRLap` / `eliminate_pair` — shared entry
             canonicalization, one dispatch for both views

Also times the CPU oracle once per view count for the reference-floor
context line.

Usage: python tools/bench_epoch.py [n] [frac] [epochs]
Writes EPOCH_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import numpy as np

    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    from rlap_tpu.augment import Compose, FeatureMasking, RLap
    from rlap_tpu.augment.rlap import PairedRLap
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.models.grace import GraceTrainer
    from rlap_tpu.native import oracle_approximate_cholesky

    log(f"devices: {jax.devices()}")
    g = barabasi_albert(n, 8, seed=0)
    rng = np.random.default_rng(0)
    g = g.replace(x=jax.numpy.asarray(
        rng.normal(size=(n, 128)).astype("float32")))
    e_live = int(np.asarray(g.edge_mask).sum())
    log(f"BA(n={n}, m=8): {e_live} directed edges; frac={frac}")

    results = {"n": n, "frac": frac, "directed_edges": e_live,
               "hidden_dim": 128, "num_layers": 2}

    def time_epochs(tr, label):
        t0 = time.perf_counter()
        tr.train_epoch(g)  # compile + first step
        warm = time.perf_counter() - t0
        log(f"{label}: first epoch (compile+run) {warm:.1f}s")
        t0 = time.perf_counter()
        for _ in range(epochs):
            tr.train_epoch(g)  # float(loss) inside syncs per epoch
        dt = (time.perf_counter() - t0) / epochs * 1e3
        log(f"{label}: {dt:.1f} ms/epoch")
        return dt

    # separate (the recipe default)
    a1 = Compose([RLap(frac), FeatureMasking(0.3)])
    a2 = Compose([RLap(frac), FeatureMasking(0.3)])
    tr = GraceTrainer(a1, a2, hidden_dim=128, num_layers=2, seed=0)
    sep_ms = time_epochs(tr, "separate")

    # augmentation-only timing for the separate path
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(epochs):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        v1 = a1(g, k1)
        v2 = a2(g, k2)
        jax.block_until_ready((v1.senders, v2.senders))
    aug_ms = (time.perf_counter() - t0) / epochs * 1e3
    log(f"separate augmentation alone: {aug_ms:.1f} ms/epoch")

    # paired
    trp = GraceTrainer(hidden_dim=128, num_layers=2, seed=0,
                       pair_augmentor=PairedRLap(frac, pf=0.3))
    pair_ms = time_epochs(trp, "paired")

    t0 = time.perf_counter()
    pa = PairedRLap(frac, pf=0.3)
    for i in range(epochs):
        v1, v2 = pa(g, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready((v1.senders, v2.senders))
    pair_aug_ms = (time.perf_counter() - t0) / epochs * 1e3
    log(f"paired augmentation alone: {pair_aug_ms:.1f} ms/epoch")

    # reference-architecture context: the sequential CPU engine per view
    mask = np.asarray(g.edge_mask)
    ei = np.stack([np.asarray(g.senders)[mask],
                   np.asarray(g.receivers)[mask]])
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        oracle_approximate_cholesky(ei, None, n, int(frac * n),
                                    o_v="random", o_n="random", seed=i)
        times.append(time.perf_counter() - t0)
    oracle_ms = float(np.median(times)) * 1e3
    log(f"CPU oracle single view: {oracle_ms:.0f} ms "
        f"(reference epoch floor ~{2 * oracle_ms:.0f} ms + 2 host "
        f"round-trips + encoder/loss)")

    results.update(
        epoch_ms_separate=round(sep_ms, 1),
        epoch_ms_paired=round(pair_ms, 1),
        augmentation_ms_separate=round(aug_ms, 1),
        augmentation_ms_paired=round(pair_aug_ms, 1),
        encoder_loss_ms=round(sep_ms - aug_ms, 1),
        cpu_oracle_view_ms=round(oracle_ms, 1),
        reference_augmentation_floor_ms=round(2 * oracle_ms, 1),
        epochs_timed=epochs,
    )
    with open("EPOCH_BENCH.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
