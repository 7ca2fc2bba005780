"""Experiment runner CLI: one grid point per invocation, or a sweep.

Replaces the reference's per-recipe `main()` argparse drivers
(`node_shared.py:292-303` etc.) and the shell grid loops (`run_*.sh`).

Usage:
  python -m rlap_tpu.cli.run --recipe grace --dataset CORA \
      --augmentor rLap --fraction1 0.2 --fraction2 0.2 [--results-dir out/]
  python -m rlap_tpu.cli.run --sweep --recipe grace --results-dir out/
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def run_one(cfg, results_dir=None, eval_repeats: int = 1,
            checkpoint_dir=None, checkpoint_every: int = 100):
    import jax

    from rlap_tpu.augment import make_augmentor_pair
    from rlap_tpu.data.loaders import load_dataset, load_graph_dataset
    from rlap_tpu.utils.config import ExperimentConfig
    from rlap_tpu.utils.logging import MetricsLogger

    log = MetricsLogger(
        path=None if results_dir is None
        else f"{results_dir}/{cfg.run_name()}.jsonl",
        run_id=cfg.run_name(), recipe=cfg.recipe, dataset=cfg.dataset,
        augmentor=cfg.augmentor)
    log.log("config", **dataclasses.asdict(cfg))
    t0 = time.time()

    if cfg.recipe in ("grace", "mvgrl", "cca_ssg"):
        g, y, meta = load_dataset(cfg.dataset)
        log.log("dataset", num_nodes=g.num_nodes,
                num_edges=int(np.asarray(g.edge_mask).sum()),
                synthetic=meta["synthetic"])

        if cfg.recipe == "grace":
            from rlap_tpu.models.grace import GraceTrainer

            a1, a2 = make_augmentor_pair(cfg.augmentor, cfg.fraction1,
                                         cfg.fraction2,
                                         num_nodes=g.num_nodes)
            tr = GraceTrainer(a1, a2, hidden_dim=cfg.hidden_dim,
                              num_layers=cfg.num_layers, lr=cfg.lr,
                              weight_decay=cfg.weight_decay, seed=cfg.seed)
            losses = tr.fit(g, max_epochs=cfg.max_epochs,
                            tolerance=cfg.tolerance,
                            checkpoint_dir=checkpoint_dir,
                            checkpoint_every=checkpoint_every)
        elif cfg.recipe == "mvgrl":
            from rlap_tpu.models.mvgrl import MVGRLTrainer

            a1, a2 = make_augmentor_pair(cfg.augmentor, cfg.fraction1,
                                         cfg.fraction2,
                                         num_nodes=g.num_nodes)
            tr = MVGRLTrainer(a1, a2, augmentor_name=cfg.augmentor,
                              hidden_dim=cfg.hidden_dim,
                              num_layers=cfg.num_layers, lr=cfg.lr,
                              weight_decay=cfg.weight_decay, seed=cfg.seed)
            losses = tr.fit(g, max_epochs=cfg.max_epochs,
                            tolerance=cfg.tolerance,
                            checkpoint_dir=checkpoint_dir,
                            checkpoint_every=checkpoint_every)
        else:
            from rlap_tpu.augment.cca_registry import make_cca_augmentor
            from rlap_tpu.models.cca_ssg import CCASSGTrainer

            aug = make_cca_augmentor(
                cfg.augmentor if cfg.augmentor in
                ("random", "rlap", "ea", "nd", "markovd", "pprd", "rws",
                 "ed_deg", "ed_ppr", "ed_evc") else "rlap",
                cfg.feat_drop_rate, cfg.fraction1)
            tr = CCASSGTrainer(aug, hidden_dim=cfg.hidden_dim,
                               out_dim=cfg.hidden_dim,
                               num_layers=cfg.num_layers, lr=cfg.lr,
                               weight_decay=cfg.weight_decay, lam=cfg.lam,
                               seed=cfg.seed)
            losses = tr.fit(g, max_epochs=min(cfg.max_epochs, 100),
                            checkpoint_dir=checkpoint_dir,
                            checkpoint_every=checkpoint_every)

        if not losses:
            # resumed from a checkpoint that had already finished (final
            # epoch or early stop): evaluate without training — covers
            # every checkpointed recipe branch
            losses = [float("nan")]
        log.metric("final_loss", losses[-1], step=len(losses))
        log.metric("epochs", len(losses))
        # raw-feature control: the same linear-probe protocol on g.x
        # directly — embeddings must beat this for the recipe to be
        # credited with learning structure (meaningful on the synthetic
        # stand-ins, whose features are deliberately weakly informative)
        from rlap_tpu.eval import get_split, lr_evaluate

        split0 = get_split(g.num_nodes, 0.1, 0.8, seed=0)
        raw = lr_evaluate(np.asarray(g.x), y, split0,
                          num_classes=int(np.max(np.asarray(y))) + 1)
        log.log("raw_feature_baseline", accuracy=raw["accuracy"],
                micro_f1=raw["micro_f1"])
        for rep in range(eval_repeats):
            res = tr.evaluate(g, y, seed=rep)
            # the reference's scraped grammar, as structured fields
            # (`node_shared.py:531-534`)
            log.log("test_run", repeat=rep, micro_f1=res["micro_f1"],
                    macro_f1=res["macro_f1"], accuracy=res["accuracy"])
    else:
        graphs, y, meta = load_graph_dataset(cfg.dataset)
        log.log("dataset", num_graphs=len(graphs),
                synthetic=meta["synthetic"])
        from rlap_tpu.augment import make_augmentor_pair as map_

        a1, a2 = map_(cfg.augmentor, cfg.fraction1, cfg.fraction2,
                      num_nodes=max(g.num_nodes for g in graphs))
        if cfg.recipe == "graphcl":
            from rlap_tpu.models.graphcl import GraphCLTrainer

            tr = GraphCLTrainer(a1, a2, hidden_dim=cfg.hidden_dim,
                                num_layers=cfg.num_layers, lr=cfg.lr,
                                weight_decay=cfg.weight_decay, seed=cfg.seed)
        else:
            from rlap_tpu.models.bgrl import BGRLTrainer

            tr = BGRLTrainer(a1, a2, hidden_dim=cfg.hidden_dim,
                             num_layers=cfg.num_layers, lr=cfg.lr,
                             weight_decay=cfg.weight_decay, seed=cfg.seed)
        losses = tr.fit(graphs, max_epochs=min(cfg.max_epochs, 100),
                        tolerance=cfg.tolerance,
                        checkpoint_dir=checkpoint_dir,
                        checkpoint_every=checkpoint_every)
        if not losses:
            losses = [float("nan")]
        log.metric("final_loss", losses[-1], step=len(losses))
        for rep in range(eval_repeats):
            res = tr.evaluate(graphs, y, seed=rep)
            log.log("test_run", repeat=rep, micro_f1=res["micro_f1"],
                    macro_f1=res["macro_f1"], accuracy=res["accuracy"])

    log.metric("wall_seconds", time.time() - t0)
    return log


def main(argv=None):
    from rlap_tpu.utils.config import ExperimentConfig, sweep

    p = argparse.ArgumentParser()
    for f in dataclasses.fields(ExperimentConfig):
        p.add_argument(f"--{f.name.replace('_', '-')}", type=type(f.default),
                       default=f.default)
    p.add_argument("--results-dir", type=str, default=None)
    p.add_argument("--eval-repeats", type=int, default=1)
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="save trainer state here every --checkpoint-every "
                        "epochs and resume from it on restart (all recipes)")
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--sweep", action="store_true",
                   help="run the reference grid for --recipe")
    args = p.parse_args(argv)

    cfg = ExperimentConfig(**{
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(ExperimentConfig)})

    if not args.sweep:
        run_one(cfg, results_dir=args.results_dir,
                eval_repeats=args.eval_repeats,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=args.checkpoint_every)
        return

    # the reference grids, resumable (skip-if-result-exists)
    fracs = [0.1, 0.2, 0.3, 0.4, 0.5]  # run_*.sh fraction loops 0..0.5
    if cfg.recipe in ("grace", "mvgrl"):
        # run_node_shared.sh:4-12 / run_node_dedicated.sh
        grid = dict(
            augmentor=["rLap", "rLapRandomDesc", "rLapRandomRandom",
                       "rLapDegree", "rLapCoarsen", "EdgeAddition",
                       "EdgeDropping", "NodeDropping", "PPRDiffusion",
                       "MarkovDiffusion"],
            num_layers=[2, 4, 8],
            lr=[1e-2, 1e-3, 1e-4],
            hidden_dim=[128, 256, 512],
            fraction1=fracs,
            fraction2=fracs,
        )
    elif cfg.recipe in ("graphcl", "bgrl"):
        # run_graph_shared.sh / run_graph_shared_g2l.sh: TU datasets x
        # augmentors x fractions
        grid = dict(
            dataset=["PROTEINS_full", "MUTAG", "IMDB-BINARY", "IMDB-MULTI",
                     "NCI1"],
            augmentor=["rLap", "EdgeAddition", "EdgeDropping", "NodeDropping",
                       "PPRDiffusion"],
            fraction1=fracs,
            fraction2=fracs,
        )
    else:
        # CCA-SSG/run.sh: 10 augmentor functions x 3 datasets
        grid = dict(
            dataset=["CORA", "CITESEER", "AMAZON-COMPUTERS"],
            augmentor=["random", "rlap", "ea", "nd", "markovd", "pprd",
                       "rws", "ed_deg", "ed_ppr", "ed_evc"],
            fraction1=fracs,
        )
    for point in sweep(cfg, results_dir=args.results_dir, **grid):
        print(f"=== {point.run_name()} ===", file=sys.stderr, flush=True)
        run_one(point, results_dir=args.results_dir,
                eval_repeats=args.eval_repeats)


if __name__ == "__main__":
    main()
