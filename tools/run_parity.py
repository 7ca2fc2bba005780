"""One-command real-data accuracy-parity runner (VERDICT r4 item 9).

The build environment has zero network egress (DATA.md), so the reference's
real benchmark files cannot be fetched here; this script IS the committed
protocol for the day they are available. Given the standard dataset files
under `$RLAP_TPU_DATA` (or --data-root), it

  1. discovers every reference dataset actually present (the loaders parse
     the real on-disk formats; synthetic stand-ins are REFUSED here),
  2. records a provenance manifest (sha256 of every input file consumed),
  3. runs the full evaluation protocol on each: node recipes GRACE +
     CCA-SSG (`node_shared.py:308-322,530-534`), graph recipes GraphCL +
     BGRL (`run_graph_shared.sh`), flagship rLap augmentor (widen with
     --augmentors), 2000-epoch training with early stop, 10 eval repeats,
  4. regenerates `<results-dir>/RESULTS.md` with synthetic=False rows.

Usage:
  python tools/run_parity.py                     # full protocol, real data
  python tools/run_parity.py --datasets CORA,MUTAG --augmentors rLap,EdgeDropping
  python tools/run_parity.py --dry               # no data needed: writes
        format-faithful miniatures (Planetoid pickles, TU text triples) at
        probe-viable scale into a temp root and drives the IDENTICAL
        discover->manifest->train->evaluate->report path end to end.

Expected layouts (names exactly as distributed by the canonical mirrors
PyG/DGL download; the manifest pins what was actually used):
  $RLAP_TPU_DATA/Cora/raw/ind.cora.{x,tx,allx,y,ty,ally,graph,test.index}
  $RLAP_TPU_DATA/CiteSeer/raw/ind.citeseer.*   $RLAP_TPU_DATA/PubMed/raw/...
  $RLAP_TPU_DATA/ms_academic_cs.npz            (Coauthor-CS)
  $RLAP_TPU_DATA/MUTAG/MUTAG_{A,graph_indicator,graph_labels}.txt
  $RLAP_TPU_DATA/PROTEINS_full/PROTEINS_full_*.txt  ... etc (TU datasets)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NODE_RECIPES = ("grace", "cca_ssg")
GRAPH_RECIPES = ("graphcl", "bgrl")


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def dataset_files(root: Path, name: str):
    """The input files a dataset load consumes (for the manifest)."""
    if name in ("CORA", "CITESEER", "PUBMED"):
        sub = {"CORA": "Cora", "CITESEER": "CiteSeer",
               "PUBMED": "PubMed"}[name]
        for cand in (root / sub / "raw", root / sub, root):
            if (cand / f"ind.{sub.lower()}.graph").exists():
                return sorted(cand.glob(f"ind.{sub.lower()}.*"))
    npz = {"COAUTHOR-CS": "ms_academic_cs.npz",
           "COAUTHOR-PHY": "ms_academic_phy.npz",
           "AMAZON-PHOTO": "amazon_electronics_photo.npz",
           "AMAZON-COMPUTERS": "amazon_electronics_computers.npz"}
    if name in npz:
        for cand in (root / npz[name], root / name / npz[name]):
            if cand.exists():
                return [cand]
    for cand in (root / name, root / name / name):
        if (cand / f"{name}_A.txt").exists():
            return sorted(cand.glob(f"{name}_*.txt"))
    return []


def discover(root: Path, wanted=None):
    from rlap_tpu.data.loaders import GRAPH_DATASETS, NODE_DATASETS

    found = []
    for name in NODE_DATASETS:
        if wanted and name not in wanted:
            continue
        if dataset_files(root, name):
            found.append(("node", name))
    for name in GRAPH_DATASETS:
        if wanted and name not in wanted:
            continue
        if dataset_files(root, name):
            found.append(("graph", name))
    return found


# ---------------------------------------------------------------------------
# --dry: format-faithful miniatures at probe-viable scale
# ---------------------------------------------------------------------------


def write_planetoid_miniature(root: Path, name: str, n: int = 256,
                              classes: int = 4, fdim: int = 16,
                              seed: int = 0):
    """An SBM written as real Planetoid pickle files (the format
    `load_planetoid` and PyG both parse): CSR x/tx/allx, one-hot
    y/ty/ally, adjacency dict, test.index."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, size=n)
    centers = rng.normal(size=(classes, fdim))
    x = (centers[y] + rng.normal(scale=2.0, size=(n, fdim))).astype(
        np.float32)
    p_in, p_out = 0.08, 0.005
    prob = np.where(y[:, None] == y[None, :], p_in, p_out)
    upper = np.triu(rng.random((n, n)) < prob, k=1)
    s, r = np.nonzero(upper | upper.T)
    graph = {}
    for a, b in zip(s.tolist(), r.tolist()):
        graph.setdefault(a, []).append(b)
    n_test = n // 8
    n_train = n // 8
    test_idx = np.arange(n - n_test, n)

    d = root / name / "raw"
    d.mkdir(parents=True, exist_ok=True)
    low = name.lower()
    eye = np.eye(classes, dtype=np.int32)
    objs = {
        "x": sp.csr_matrix(x[:n_train]),
        "tx": sp.csr_matrix(x[test_idx]),
        "allx": sp.csr_matrix(x[: n - n_test]),
        "y": eye[y[:n_train]],
        "ty": eye[y[test_idx]],
        "ally": eye[y[: n - n_test]],
        "graph": graph,
    }
    for suf, obj in objs.items():
        with open(d / f"ind.{low}.{suf}", "wb") as f:
            pickle.dump(obj, f)
    with open(d / f"ind.{low}.test.index", "w") as f:
        f.write("\n".join(str(i) for i in test_idx) + "\n")


def write_tu_miniature(root: Path, name: str, num_graphs: int = 40,
                       seed: int = 0):
    """A density-separable two-class set written as a real TU text triple."""
    rng = np.random.default_rng(seed)
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    a_rows, gi, gl = [], [], []
    base = 1  # TU files are 1-indexed
    for gid in range(num_graphs):
        n = int(rng.integers(8, 16))
        dense = gid % 2
        p = 0.5 if dense else 0.15
        upper = np.triu(rng.random((n, n)) < p, k=1)
        s, r = np.nonzero(upper | upper.T)
        for aa, bb in zip(s.tolist(), r.tolist()):
            a_rows.append((aa + base, bb + base))
        gi.extend([gid + 1] * n)
        gl.append(1 if dense else -1)
        base += n
    with open(d / f"{name}_A.txt", "w") as f:
        f.writelines(f"{a}, {b}\n" for a, b in a_rows)
    with open(d / f"{name}_graph_indicator.txt", "w") as f:
        f.writelines(f"{g}\n" for g in gi)
    with open(d / f"{name}_graph_labels.txt", "w") as f:
        f.writelines(f"{g}\n" for g in gl)


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def run(root: Path, results_dir: Path, datasets, augmentors, seeds,
        eval_repeats: int, max_epochs: int, hidden_dim: int,
        log=print):
    from rlap_tpu.cli.run import run_one
    from rlap_tpu.utils.config import ExperimentConfig

    found = discover(root, datasets)
    if not found:
        log(f"No reference dataset files found under {root}. Place the "
            "standard files there (see module docstring) or run --dry.")
        return 1
    results_dir.mkdir(parents=True, exist_ok=True)

    manifest = {"data_root": str(root), "generated": time.time(),
                "datasets": {}}
    for kind, name in found:
        manifest["datasets"][name] = {
            "kind": kind,
            "files": {str(p.relative_to(root)): sha256(p)
                      for p in dataset_files(root, name)}}
    with open(results_dir / "MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)
    log(f"datasets found: {[n for _, n in found]} (manifest written)")

    os.environ["RLAP_TPU_DATA"] = str(root)  # loaders resolve through this
    cca_map = {"rLap": "rlap", "EdgeDropping": "random",
               "EdgeAddition": "ea", "NodeDropping": "nd",
               "PPRDiffusion": "pprd", "MarkovDiffusion": "markovd"}
    for kind, name in found:
        recipes = NODE_RECIPES if kind == "node" else GRAPH_RECIPES
        for recipe in recipes:
            for aug in augmentors:
                if recipe == "cca_ssg":
                    aug = cca_map.get(aug, "rlap")
                for seed in seeds:
                    cfg = ExperimentConfig(
                        recipe=recipe, dataset=name, augmentor=aug,
                        hidden_dim=hidden_dim, max_epochs=max_epochs,
                        seed=seed)
                    out = results_dir / f"{cfg.run_name()}.jsonl"
                    if out.exists():
                        log(f"skip (done): {cfg.run_name()}")
                        continue
                    log(f"=== {cfg.run_name()} ===")
                    run_one(cfg, results_dir=str(results_dir),
                            eval_repeats=eval_repeats)

    # regenerate the results table next to the runs
    from rlap_tpu.utils.logging import read_metrics, results_table

    paths = sorted(str(p) for p in results_dir.glob("*.jsonl"))
    synth = [rec.get("synthetic")
             for p in paths for rec in read_metrics(p, "dataset")]
    assert not any(synth), (
        "parity runs must load real files; a synthetic fallback fired")
    lines = ["# Real-data parity results (synthetic=False)", "",
             f"Generated by tools/run_parity.py; provenance in "
             f"MANIFEST.json ({len(manifest['datasets'])} datasets).", "",
             results_table(paths, metric="accuracy", row_key="recipe",
                           col_key="dataset"), "",
             results_table(paths, metric="accuracy", row_key="augmentor",
                           col_key="dataset"), ""]
    with open(results_dir / "RESULTS.md", "w") as f:
        f.write("\n".join(lines))
    log(f"wrote {results_dir}/RESULTS.md from {len(paths)} runs")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default=None)
    p.add_argument("--results-dir", default="results/parity")
    p.add_argument("--datasets", default=None,
                   help="comma list; default = everything discovered")
    p.add_argument("--augmentors", default="rLap")
    p.add_argument("--seeds", default="0")
    p.add_argument("--eval-repeats", type=int, default=10)
    p.add_argument("--max-epochs", type=int, default=2000)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--dry", action="store_true",
                   help="write format-faithful miniatures to a temp root "
                        "and drive the identical pipeline (fast; no data)")
    args = p.parse_args(argv)

    import jax

    if jax.default_backend() not in ("tpu", "axon") or args.dry:
        jax.config.update("jax_platforms", "cpu")

    if args.dry:
        import tempfile

        root = Path(tempfile.mkdtemp(prefix="rlap_parity_dry_"))
        write_planetoid_miniature(root, "Cora")
        write_tu_miniature(root, "MUTAG")
        results = Path(tempfile.mkdtemp(prefix="rlap_parity_out_"))
        rc = run(root, results, None, args.augmentors.split(","),
                 [0], eval_repeats=2, max_epochs=4, hidden_dim=32)
        print(f"dry parity pipeline OK -> {results}")
        return rc

    root = Path(args.data_root or os.environ.get(
        "RLAP_TPU_DATA", os.path.expanduser("~/datasets")))
    wanted = (set(x.strip().upper() if x.strip().upper() != x.strip()
                  else x.strip() for x in args.datasets.split(","))
              if args.datasets else None)
    # dataset registry names are case-exact for TU, upper for node
    if wanted:
        wanted = set()
        for x in args.datasets.split(","):
            x = x.strip()
            wanted.add(x)
            wanted.add(x.upper())
    return run(root, Path(args.results_dir), wanted,
               args.augmentors.split(","),
               [int(s) for s in args.seeds.split(",")],
               eval_repeats=args.eval_repeats, max_epochs=args.max_epochs,
               hidden_dim=args.hidden_dim)


if __name__ == "__main__":
    sys.exit(main())
