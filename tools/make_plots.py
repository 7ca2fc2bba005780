"""Emit the reference's spectral / PPR analysis plots as PNGs.

TPU-native analogue of `scripts/rlap_vc_spectral.py:61-116` (per-step
max-singular-value, unique-node and edge-count curves of iterated rLap,
mean +- std over runs, one panel per metric with one line per (o_v, o_n)
combo) and `scripts/rlap_ppr_edge_plots.py:37-95` (edge counts of PPR vs
rLap->PPR views per elimination fraction, grouped bars).

Usage: python tools/make_plots.py [n] [outdir]
  n       graph size for BA(n, 4) (default 1000)
  outdir  output directory (default results/plots)

Writes rlap_spectral_<metric>.png and rlap_ppr_edges.png plus a
provenance JSON with the raw curve data.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


COMBOS = [("random", "random"), ("random", "asc"), ("random", "desc"),
          ("degree", "random"), ("coarsen", "random")]
METRICS = (("max_sv", "max singular value"),
           ("nodes", "unique nodes"),
           ("edges", "edge count"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "plots")
    os.makedirs(outdir, exist_ok=True)

    import jax

    from rlap_tpu.bench.spectral import iterated_rlap_curves, ppr_edge_counts
    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    g = barabasi_albert(n, 4, seed=0)

    batch_count, num_runs = 10, 10
    data = {}
    for o_v, o_n in COMBOS:
        print(f"curves for o_v={o_v} o_n={o_n} ...", flush=True)
        data[f"{o_v}/{o_n}"] = {
            k: v.tolist()
            for k, v in iterated_rlap_curves(
                g, o_v=o_v, o_n=o_n, total_frac=0.5,
                batch_count=batch_count, num_runs=num_runs, seed=0).items()}

    steps = np.arange(batch_count + 1)
    for key_m, label in METRICS:
        fig, ax = plt.subplots(figsize=(6.4, 4.2))
        for combo, curves in data.items():
            mean = np.asarray(curves[f"{key_m}_mean"])
            std = np.asarray(curves[f"{key_m}_std"])
            ax.plot(steps, mean, marker="o", markersize=3, label=combo)
            ax.fill_between(steps, mean - std, mean + std, alpha=0.2)
        ax.set_xlabel(f"elimination step (frac 0.5 over {batch_count} steps)")
        ax.set_ylabel(label)
        ax.set_title(f"iterated rLap on BA({n}, 4): {label} "
                     f"(mean +- std over {num_runs} runs)")
        ax.legend(fontsize=8)
        fig.tight_layout()
        path = os.path.join(outdir, f"rlap_spectral_{key_m}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print(f"wrote {path}", flush=True)

    print("ppr edge counts ...", flush=True)
    fractions = (0.1, 0.2, 0.3, 0.4, 0.5)
    ppr = ppr_edge_counts(g, fractions=fractions)
    fig, ax = plt.subplots(figsize=(6.4, 4.2))
    xs = np.arange(len(fractions))
    ax.bar(xs - 0.2, [ppr["ppr"]] * len(fractions), width=0.4,
           label="PPR (full graph)")
    ax.bar(xs + 0.2, [ppr["rlap_ppr"][f] for f in fractions], width=0.4,
           label="rLap -> PPR")
    ax.set_xticks(xs, [f"{f:.1f}" for f in fractions])
    ax.set_xlabel("elimination fraction")
    ax.set_ylabel("edges in diffusion view")
    ax.set_title(f"PPR vs rLap->PPR edge counts, BA({n}, 4)")
    ax.legend()
    fig.tight_layout()
    path = os.path.join(outdir, "rlap_ppr_edges.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}", flush=True)

    prov = {"n": n, "batch_count": batch_count, "num_runs": num_runs,
            "device": str(jax.devices()[0]), "curves": data,
            "ppr_edges": {"ppr": ppr["ppr"],
                          "rlap_ppr": {str(k): v
                                       for k, v in ppr["rlap_ppr"].items()}}}
    path = os.path.join(outdir, "plot_data.json")
    with open(path, "w") as f:
        json.dump(prov, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
