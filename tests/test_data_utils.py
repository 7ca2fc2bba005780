"""Data loaders (format parsers + synthetic fallback), utils (logging,
config, checkpoint), CCA augmentor registry, CLI smoke."""

import json
import warnings

import jax
import numpy as np
import pytest

from rlap_tpu.core import graph as G


def test_tu_format_roundtrip(tmp_path):
    from rlap_tpu.data.loaders import load_tu

    d = tmp_path / "TOY"
    d.mkdir()
    # two triangles (nodes 1-3, 4-6), labels 1 / -1, node labels
    (d / "TOY_A.txt").write_text(
        "1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n5, 6\n6, 5\n")
    (d / "TOY_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n2\n")
    (d / "TOY_graph_labels.txt").write_text("1\n-1\n")
    (d / "TOY_node_labels.txt").write_text("0\n1\n0\n1\n0\n1\n")
    graphs, y = load_tu(str(tmp_path), "TOY")
    assert len(graphs) == 2
    np.testing.assert_array_equal(sorted(y), [0, 1])
    assert graphs[0].num_nodes == 3
    assert int(graphs[0].num_edges) == 6
    assert int(graphs[1].num_edges) == 4
    assert graphs[0].x.shape == (3, 2)  # one-hot node labels


def test_load_dataset_synthetic_fallback():
    from rlap_tpu.data.loaders import load_dataset

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        g, y, meta = load_dataset("CORA", root="/nonexistent",
                                  synthetic_scale=0.05)
    assert meta["synthetic"]
    assert g.num_nodes >= 64
    assert g.x is not None
    assert len(y) == g.num_nodes


def test_cca_split_shapes():
    from rlap_tpu.data.loaders import cca_split

    s = cca_split(100, None, seed=0)
    assert s["train"].sum() == 10
    assert s["valid"].sum() == 10
    assert s["test"].sum() == 80
    assert not (s["train"] & s["test"]).any()


def test_metrics_logger_roundtrip(tmp_path):
    from rlap_tpu.utils.logging import MetricsLogger, aggregate, read_metrics

    p = tmp_path / "m.jsonl"
    log = MetricsLogger(str(p), run_id="t", echo=False)
    log.metric("acc", 0.5)
    log.metric("acc", 0.7)
    recs = list(read_metrics(str(p), "metric"))
    assert len(recs) == 2
    agg = aggregate([str(p)], "acc")
    np.testing.assert_allclose(agg["mean"], 0.6)
    assert agg["n"] == 2


def test_config_sweep_resumable(tmp_path):
    from rlap_tpu.utils.config import ExperimentConfig, sweep

    base = ExperimentConfig()
    pts = list(sweep(base, lr=[1e-2, 1e-3], hidden_dim=[64, 128]))
    assert len(pts) == 4
    done = pts[0]
    (tmp_path / f"{done.run_name()}.jsonl").write_text("{}")
    rest = list(sweep(base, results_dir=str(tmp_path),
                      lr=[1e-2, 1e-3], hidden_dim=[64, 128]))
    assert len(rest) == 3


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from rlap_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path / "ckpt"), state, step=1)
    template = {"w": jnp.zeros((2, 3)), "step": jnp.asarray(0)}
    out = restore_checkpoint(str(tmp_path / "ckpt"), template)
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(out["step"]) == 7


def test_cca_registry_all_names():
    from rlap_tpu.augment.cca_registry import CCA_AUGMENTORS
    from rlap_tpu.data.synthetic import synthetic_node_dataset

    g, _ = synthetic_node_dataset(n=48, feature_dim=8)
    key = jax.random.PRNGKey(0)
    for name, fn in CCA_AUGMENTORS.items():
        out = fn(g, key, 0.2, 0.3)
        assert out.num_nodes == 48, name
        assert np.isfinite(np.asarray(out.weights)).all(), name


def test_spectral_curves_monotone_nodes():
    from rlap_tpu.bench.spectral import iterated_rlap_curves
    from rlap_tpu.data.synthetic import barabasi_albert

    g = barabasi_albert(60, 3, seed=0)
    curves = iterated_rlap_curves(g, batch_count=3, num_runs=2,
                                  total_frac=0.3)
    nodes = curves["nodes_mean"]
    assert (np.diff(nodes) <= 0).all()
    assert np.isfinite(curves["max_sv_mean"]).all()


def test_cli_run_one(tmp_path):
    from rlap_tpu.cli.run import run_one
    from rlap_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(recipe="grace", dataset="CORA", augmentor="rLap",
                           hidden_dim=16, max_epochs=3, tolerance=3)
    import os
    os.environ["RLAP_TPU_DATA"] = "/nonexistent"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # shrink the synthetic stand-in for test speed
        import rlap_tpu.data.loaders as L
        orig = L._SYN_SHAPES.copy()
        L._SYN_SHAPES["CORA"] = (128, 4, 32)
        try:
            run_one(cfg, results_dir=str(tmp_path))
        finally:
            L._SYN_SHAPES.update(orig)
    out = tmp_path / f"{cfg.run_name()}.jsonl"
    assert out.exists()
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    events = {l["event"] for l in lines}
    assert "test_run" in events
