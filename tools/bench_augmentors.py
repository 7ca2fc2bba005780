"""Run the augmentor latency/memory benchmark harness on the active device
and write AUGMENTOR_BENCH.json at the repo root (the reference's
`run_augmentor_benchmarks.sh` -> `prepare_augmentor_stats.py` pipeline,
with committed results).

Usage: python tools/bench_augmentors.py [n] [repeats]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    import numpy as np

    from rlap_tpu.bench.augmentors import bench_all
    from rlap_tpu.data.synthetic import (synthetic_graph_dataset,
                                         synthetic_node_dataset)

    from rlap_tpu.augment import AUGMENTOR_NAMES

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AUGMENTOR_BENCH.json")
    out = {"device": str(dev), "platform": dev.platform, "n": n,
           "repeats": repeats, "results": {}}
    if os.path.exists(path):  # resume: skip names already measured
        with open(path) as f:
            prev = json.load(f)
        if prev.get("n") == n and prev.get("platform") == dev.platform:
            out = prev

    g, _ = synthetic_node_dataset(n=n, feature_dim=128,
                                  p_in=min(20.0 / n, 1.0),
                                  p_out=min(2.0 / n, 1.0), seed=0)
    # graph-level task: block-diagonal batch, the reference's DataLoader
    # batch_size=128 path (`augmentor_benchmarks.py:380-393`)
    graphs, _ = synthetic_graph_dataset(num_graphs=128, seed=1)

    todo = [nm for nm in AUGMENTOR_NAMES
            if nm not in out["results"]
            or nm + "/batch" not in out["results"]]
    for name in todo:
        res = bench_all(g, names=[name], fraction=0.2, repeats=repeats,
                        graphs=graphs)
        out["results"].update(res)
        print(f"{name:28s} {res[name]['latency_ms_mean']:10.1f} ms  "
              f"{res[name]['edges_per_s']:14,.0f} edges/s  (+batch)",
              flush=True)
        with open(path, "w") as f:  # incremental: survive timeouts
            json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(out['results'])} augmentors)", flush=True)


if __name__ == "__main__":
    main()
