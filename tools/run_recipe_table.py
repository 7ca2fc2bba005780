"""Regenerate the per-recipe results rows on the current stand-ins:
MVGRL (rLapPPRDiffusion) and CCA-SSG (rlap) on CORA, 3 seeds x 10 eval
repeats each — the node-recipe rows of RESULTS.md (grace rows come from
tools/sweep_augmentors.py; graph-level rows keep their MUTAG runs).

Usage: python tools/run_recipe_table.py [results_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    results_dir = sys.argv[1] if len(sys.argv) > 1 else "results"

    from rlap_tpu.cli.run import run_one
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    from rlap_tpu.utils.config import ExperimentConfig

    setup_compilation_cache()
    jobs = []
    for seed in range(3):
        jobs.append(ExperimentConfig(recipe="mvgrl", dataset="CORA",
                                     augmentor="rLapPPRDiffusion",
                                     fraction1=0.2, fraction2=0.2,
                                     seed=seed))
        jobs.append(ExperimentConfig(recipe="cca_ssg", dataset="CORA",
                                     augmentor="rlap", fraction1=0.2,
                                     fraction2=0.2, seed=seed))
    for cfg in jobs:
        path = f"{results_dir}/{cfg.run_name()}.jsonl"
        if os.path.exists(path):
            print(f"skip {cfg.run_name()}", flush=True)
            continue
        t0 = time.time()
        print(f"=== {cfg.run_name()} ===", flush=True)
        run_one(cfg, results_dir=results_dir, eval_repeats=10)
        print(f"    {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
