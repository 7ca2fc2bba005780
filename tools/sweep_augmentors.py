"""Run the full GRACE augmentor axis on the TPU: every registry name
(`rlap_tpu/augment/registry.py:21-28`) x CORA x seeds, with the
reference's 10-repeat evaluation protocol (`node_shared.py:530-534`).

Resumable: a registry point whose results file already holds 10 test_run
records is skipped (the reference drivers' skip-if-log-exists semantics,
`run_node_shared.sh:28-31`).

Usage: python tools/sweep_augmentors.py [seeds] [results_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def done(path, repeats):
    if not os.path.exists(path):
        return False
    reps = sum(1 for line in open(path)
               if json.loads(line).get("event") == "test_run")
    return reps >= repeats


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    results_dir = sys.argv[2] if len(sys.argv) > 2 else "results"
    repeats = 10

    from rlap_tpu.augment.registry import AUGMENTOR_NAMES
    from rlap_tpu.cli.run import run_one
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    from rlap_tpu.utils.config import ExperimentConfig

    setup_compilation_cache()
    for seed in range(seeds):
        for name in AUGMENTOR_NAMES:
            # InfoNCE on the weak-feature stand-in RISES for ~100
            # warm-up epochs before descending; the reference's
            # tolerance-50 early stop (node_shared.py:510-528) would
            # kill every run at epoch 51, so the sweep trains a fixed
            # 600-epoch budget with a 200-epoch patience
            cfg = ExperimentConfig(recipe="grace", dataset="CORA",
                                   augmentor=name, fraction1=0.2,
                                   fraction2=0.2, seed=seed,
                                   max_epochs=600, tolerance=200)
            path = f"{results_dir}/{cfg.run_name()}.jsonl"
            if done(path, repeats):
                print(f"skip {cfg.run_name()} (done)", flush=True)
                continue
            if os.path.exists(path):
                os.unlink(path)  # partial: redo with the full protocol
            t0 = time.time()
            print(f"=== {cfg.run_name()} ===", flush=True)
            run_one(cfg, results_dir=results_dir, eval_repeats=repeats)
            print(f"    {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
