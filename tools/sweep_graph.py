"""Graph-task sweep: GraphCL + BGRL x >= 8 applicable augmentors x seeds,
each with the reference's 10-repeat evaluation protocol — the graph-side
counterpart of tools/sweep_augmentors.py (reference grid:
`run_graph_shared.sh:4-47`, `graph_shared.py:209-218`).

Datasets: the MUTAG stand-in (188 graphs) and the PROTEINS-scale stand-in
(512 graphs); both flagged synthetic in every results row (DATA.md).

Resumable at run-file granularity (skip when a results file already holds
the full repeat count, `run_node_shared.sh:28-31` semantics).

Usage: python tools/sweep_graph.py [seeds] [results_dir] [max_epochs] [datasets_csv] [recipes_csv] [augmentors_csv]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUGMENTORS = (
    "rLap", "rLapRandomRandom", "rLapDegree", "rLapCoarsen",
    "EdgeAddition", "EdgeDropping", "NodeDropping",
    "EdgeDroppingDegree", "PPRDiffusion",
)
DATASETS = ("MUTAG", "PROTEINS_full")
RECIPES = ("graphcl", "bgrl")


def done(path, repeats):
    if not os.path.exists(path):
        return False
    reps = sum(1 for line in open(path)
               if json.loads(line).get("event") == "test_run")
    return reps >= repeats


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results_dir = sys.argv[2] if len(sys.argv) > 2 else "results"
    max_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    datasets = (tuple(sys.argv[4].split(","))
                if len(sys.argv) > 4 else DATASETS)
    recipes = (tuple(sys.argv[5].split(","))
               if len(sys.argv) > 5 else RECIPES)
    augmentors = (tuple(sys.argv[6].split(","))
                  if len(sys.argv) > 6 else AUGMENTORS)
    repeats = 10

    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")

    from rlap_tpu.cli.run import run_one
    from rlap_tpu.utils.config import ExperimentConfig

    os.makedirs(results_dir, exist_ok=True)
    for dataset in datasets:
        for recipe in recipes:
            for name in augmentors:
                for seed in range(seeds):
                    eps = max_epochs if dataset == "MUTAG" else \
                        max(max_epochs * 2 // 3, 10)
                    cfg = ExperimentConfig(
                        recipe=recipe, dataset=dataset, augmentor=name,
                        hidden_dim=32, max_epochs=eps, tolerance=10,
                        seed=seed)
                    path = os.path.join(results_dir,
                                        f"{cfg.run_name()}.jsonl")
                    if done(path, repeats):
                        print(f"skip (done): {cfg.run_name()}",
                              file=sys.stderr, flush=True)
                        continue
                    if os.path.exists(path):
                        os.remove(path)  # partial run: redo
                    print(f"=== {cfg.run_name()} ===", file=sys.stderr,
                          flush=True)
                    run_one(cfg, results_dir=results_dir,
                            eval_repeats=repeats)


if __name__ == "__main__":
    main()
