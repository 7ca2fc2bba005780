"""Spectral-expectation parity: TPU elimination kernel vs sequential oracle.

The reference validates rLap *manually* via max-singular-value and edge-count
curves over elimination fractions (`scripts/rlap_vc_spectral.py:55-116`).
Here those become automated property tests (SURVEY.md §4): over several
seeds, the mean max singular value, mean live-edge count, and mean total
weight of the kernel's sampled Schur complements must sit within tolerance
bands of the oracle's.
"""

import jax
import numpy as np
import pytest

from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import barabasi_albert
from rlap_tpu.native import oracle_approximate_cholesky
from rlap_tpu.ops.rlap import approximate_cholesky

N = 100
RUNS = 8


def _edges_np(g):
    m = np.asarray(g.edge_mask)
    return (np.stack([np.asarray(g.senders)[m], np.asarray(g.receivers)[m]]),
            np.asarray(g.weights)[m])


def _stats_from_dense(d):
    sv = np.linalg.svd(d, compute_uv=False)[0]
    edges = (d > 0).sum()
    return sv, edges, d.sum()


def _oracle_stats(ei, w, t, o_v, o_n, seed):
    oi, ow = oracle_approximate_cholesky(ei, w, N, t, o_v=o_v, o_n=o_n,
                                         seed=seed)
    d = np.zeros((N, N))
    d[oi[0], oi[1]] = ow
    return _stats_from_dense(d)


def _kernel_stats(g, t, o_v, o_n, seed):
    out = approximate_cholesky(g, jax.random.PRNGKey(seed), t, o_v=o_v,
                               o_n=o_n)
    d = np.asarray(G.to_dense(out))
    return _stats_from_dense(d)


@pytest.mark.parametrize("o_v,o_n", [
    ("random", "random"), ("random", "asc"), ("random", "desc"),
    ("degree", "random"), ("coarsen", "random"),
])
@pytest.mark.parametrize("frac", [0.25, 0.5])
def test_spectral_expectation_parity(o_v, o_n, frac):
    g = barabasi_albert(N, 3, seed=11)
    ei, w = _edges_np(g)
    t = int(frac * N)

    o_sv, o_edges, o_wt = np.mean(
        [_oracle_stats(ei, w, t, o_v, o_n, s) for s in range(RUNS)], axis=0)
    k_sv, k_edges, k_wt = np.mean(
        [_kernel_stats(g, t, o_v, o_n, s) for s in range(RUNS)], axis=0)

    # mean-of-8 tolerance bands: generous enough for sampling noise, tight
    # enough to catch wrong weights/counts (a weight bug shifts these >2x).
    assert abs(k_sv - o_sv) / o_sv < 0.25, (k_sv, o_sv)
    assert abs(k_edges - o_edges) / o_edges < 0.30, (k_edges, o_edges)
    assert abs(k_wt - o_wt) / o_wt < 0.30, (k_wt, o_wt)


def test_ppr_edge_counts():
    """`ppr_edge_counts` (the reference's rlap_ppr_edge_plots.py:23-96
    analysis): PPR on the rLap Schur complement must produce a sparser
    view than PPR on the full graph — the paper's headline observation —
    and counts must be positive and monotone-ish in the retained
    fraction."""
    from rlap_tpu.bench.spectral import ppr_edge_counts
    from rlap_tpu.data.synthetic import barabasi_albert

    g = barabasi_albert(200, 4, seed=3)
    out = ppr_edge_counts(g, fractions=(0.2, 0.5), seed=0)
    assert out["ppr"] > 0
    for frac, cnt in out["rlap_ppr"].items():
        assert 0 < cnt < out["ppr"], (frac, cnt, out["ppr"])
    # removing more nodes leaves fewer post-diffusion edges
    assert out["rlap_ppr"][0.5] < out["rlap_ppr"][0.2]
