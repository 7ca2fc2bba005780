"""Regenerate RESULTS.md from results/*.jsonl — the reference's
`prepare_final_stats.py` tables without the stdout scraping.

Usage: python tools/make_results_md.py [results_dir ...]

Multiple dirs merge into one table (e.g. `results results_cpu` when part
of a sweep ran on CPU workers alongside the TPU stream); a run file name
appearing in more than one dir keeps only the first dir's copy.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlap_tpu.utils.logging import read_metrics, results_table  # noqa: E402


def main():
    rdirs = sys.argv[1:] if len(sys.argv) > 1 else ["results"]
    rdir = rdirs[0]
    by_name = {}
    for d in rdirs:
        for p in sorted(glob.glob(os.path.join(d, "*.jsonl"))):
            by_name.setdefault(os.path.basename(p), p)
    paths = sorted(by_name.values())
    synthetic = any(rec.get("synthetic")
                    for p in paths for rec in read_metrics(p, "dataset"))
    lines = [
        "# Recipe results (linear-probe accuracy, mean±std over eval "
        "repeats)",
        "",
        "Generated from "
        + ", ".join(f"`{d}/*.jsonl`" for d in rdirs)
        + " by `tools/make_results_md.py`; runs executed on the axon TPU "
        "v5e" + (" (CPU-worker runs in the later dirs)"
                 if len(rdirs) > 1 else "") + ".",
    ]
    if synthetic:
        lines += ["", "Datasets are deterministic synthetic stand-ins of "
                  "the reference datasets' shape (zero-egress environment; "
                  "real files load via `$RLAP_TPU_DATA` when present) — "
                  "numbers demonstrate the training pipelines end to end, "
                  "not published-benchmark parity. See DATA.md. Stand-in "
                  "features are deliberately weakly class-informative, so "
                  "accuracy measures structure learning; each node-recipe "
                  "run logs a `raw_feature_baseline` (same linear-probe "
                  "protocol on raw x) shown below — recipe accuracy minus "
                  "this baseline is the representation lift."]
        baselines = {}
        for p in paths:
            for rec in read_metrics(p, "raw_feature_baseline"):
                baselines[rec.get("dataset")] = rec.get("accuracy")
        if baselines:
            lines += ["", "Raw-feature linear-probe baseline: "
                      + ", ".join(f"{k}: {v:.4f}"
                                  for k, v in sorted(baselines.items()))]
        lines += ["", "Note: on unit-weight inputs the rLap o_n variants "
                  "(asc/desc/random) can coincide exactly — every column "
                  "weight ties, the ordering sorts are stable, and the "
                  "augmentor drops sampled weights — so identical rows "
                  "for rLapDegree{,Desc,Random} are genuine (verified: "
                  "the modes produce distinct outputs on weighted "
                  "graphs)."]
    arxiv = os.path.join(rdir, "arxiv_scale_ccassg.jsonl")
    if os.path.exists(arxiv):
        import json

        recs = [json.loads(x) for x in open(arxiv)]
        if recs:
            r0 = recs[0]
            mean_s = sum(r["wall_seconds"] for r in recs) / len(recs)
            lines += ["", "## ogbn-arxiv-scale sharded training",
                      "",
                      f"CCA-SSG-style step THROUGH the sharded path "
                      f"(sender-partitioned graph, sharded rLap "
                      f"augmentation on the two-key large-n kernel, "
                      f"mesh SpMM) at n={r0['n']:,}, "
                      f"{r0['directed_edges']:,} directed edges on "
                      f"{r0['n_devices']} virtual CPU devices: "
                      f"{mean_s:.0f} s/epoch mean over {len(recs)} "
                      f"epochs, loss decreasing "
                      f"({recs[0]['loss']} -> {recs[-1]['loss']}), no "
                      f"capacity overflow. `tools/run_arxiv_scale.py`."]
    lines += ["", "## By recipe", "",
              results_table(paths, metric="accuracy", row_key="recipe",
                            col_key="dataset"),
              "", "## By augmentor", "",
              results_table(paths, metric="accuracy", row_key="augmentor",
                            col_key="dataset"),
              "", "## Micro-F1 by recipe", "",
              results_table(paths, metric="micro_f1", row_key="recipe",
                            col_key="dataset"), ""]
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote RESULTS.md from {len(paths)} run files")


if __name__ == "__main__":
    main()
