"""Tracing utilities: TRACER gating, Timer accounting, profiler trace
produces an artifact directory (SURVEY.md §5a TPU equivalent)."""

import os

import jax.numpy as jnp

from rlap_tpu.utils.tracing import TRACER, Timer, annotate, trace


def test_tracer_gated(capsys, monkeypatch):
    monkeypatch.delenv("RLAP_TPU_TRACE", raising=False)
    TRACER("hidden %d", 1)
    assert capsys.readouterr().err == ""
    monkeypatch.setenv("RLAP_TPU_TRACE", "1")
    TRACER("shown %d", 2)
    assert "shown 2" in capsys.readouterr().err


def test_timer_and_annotation():
    t = Timer()
    with t("phase_a"):
        x = jnp.ones((128,)) * 2
    with t("phase_a", sync=x):
        x = x + 1
    with annotate("span"):
        _ = x.sum()
    assert t.counts["phase_a"] == 2
    assert t.totals["phase_a"] > 0


def test_profiler_trace(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        _ = (jnp.arange(1024.0) ** 2).sum().block_until_ready()
    # the profiler writes a plugins/profile/<ts>/ tree
    found = any("profile" in root for root, _, _ in os.walk(d))
    assert found
