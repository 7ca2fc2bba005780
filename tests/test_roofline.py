"""Roofline model sanity: the replayed round dynamics terminate, remove
the requested vertex count, and the implemented-schedule price dominates
the ideal price (static sizes can only add elements).

The model itself is calibration (measured ns/element), not physics, so
these tests check structure, not absolute times. BASELINE.md's
"speed-of-light per chip" bar is quantified by this model; bench.py
prints both fractions.
"""

import numpy as np

from rlap_tpu.bench.roofline import roofline_ms, schedule_ms, simulate


def test_simulate_terminates_and_removes():
    res = simulate(512, m=4, frac=0.5, seed=0)
    assert res["rounds"] < 200
    assert res["removed"] == 256
    assert res["model_ms"] > 0
    # every priced category is non-negative and something was priced
    assert all(v >= 0 for v in res["breakdown_ms"].values())
    assert sum(res["breakdown_ms"].values()) > 0


def test_schedule_price_dominates_ideal():
    for n in (512, 2048):
        res = simulate(n, m=4, frac=0.5, seed=1)
        sched = schedule_ms(n, res)
        ideal_total = res["model_ms"]
        assert sched["sched_ms"] >= ideal_total * 0.99, (
            n, sched["sched_ms"], ideal_total)
        # per-category: quantized >= ideal wherever both models price the
        # same op class at static vs exact sizes
        for k in ("sort", "scans", "lookup", "classify", "degree", "pack"):
            assert sched["breakdown_ms"][k] >= res["breakdown_ms"][k] - 1e-9


def test_roofline_ms_wrapper():
    ms, res = roofline_ms(512, m=4, frac=0.5, seed=0)
    assert np.isclose(ms, res["model_ms"])
