"""Native C++ oracle tests: marshalling, symmetry, and TSV reading —
the analogues of the reference's `TestIdentity` / `TestApproximateCholesky`
(`tests/test_rlap.py:12-65`).
"""

import numpy as np
import pytest

from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import barabasi_albert
from rlap_tpu.native import (oracle_approximate_cholesky, oracle_identity,
                             read_tsv)


def _ba_edges(n=100, m=3, seed=7):
    g = barabasi_albert(n, m, seed=seed)
    mask = np.asarray(g.edge_mask)
    s = np.asarray(g.senders)[mask]
    r = np.asarray(g.receivers)[mask]
    return np.stack([s, r]).astype(np.int64)


def test_identity_roundtrip():
    # reference TestIdentity: random 100x100 double tensor round-trip
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.normal(size=(100, 100))
        np.testing.assert_allclose(oracle_identity(a), a, atol=1e-8)


@pytest.mark.parametrize("o_v", ["random", "degree", "coarsen"])
def test_oracle_output_symmetric(o_v):
    ei = _ba_edges()
    for seed in range(5):
        out_ei, out_w = oracle_approximate_cholesky(
            ei, None, 100, 50, o_v=o_v, o_n="asc", seed=seed)
        assert out_ei.shape[0] == 2
        d = np.zeros((100, 100))
        d[out_ei[0], out_ei[1]] = out_w
        np.testing.assert_allclose(d, d.T, atol=1e-10)
        assert (out_w > 0).all()


def test_oracle_eliminates_count():
    ei = _ba_edges(80, 2, seed=1)
    out_ei, out_w = oracle_approximate_cholesky(ei, None, 80, 30, seed=3)
    deg = np.zeros(80)
    np.add.at(deg, out_ei[0], 1)
    assert (deg > 0).sum() == 50  # BA graph is connected


def test_oracle_weight_laws_single_step():
    """Eliminating the center of a weighted star: clique weights must follow
    f*(1-f)*wdeg with the suffix recurrence (closed form v_j*S_j/csum)."""
    # star center 0 with neighbors 1..3, weights 3,2,1 ; o_n=asc, degree order
    # never picks the center first (degree 3 > 1), so use random order and
    # filter runs where 0 went first.
    ei = np.array([[0, 0, 0, 1, 2, 3], [1, 2, 3, 0, 0, 0]])
    w = np.array([3.0, 2.0, 1.0, 3.0, 2.0, 1.0])
    seen = 0
    for seed in range(30):
        out_ei, out_w = oracle_approximate_cholesky(
            ei, w, 4, 1, o_v="random", o_n="asc", seed=seed)
        d = np.zeros((4, 4))
        d[out_ei[0], out_ei[1]] = out_w
        if d[0].sum() != 0:
            continue
        seen += 1
        vals = sorted(set(np.round(d[d > 0], 6)))
        np.testing.assert_allclose(vals, [np.round(5 / 6, 6), 1.0])
    assert seen > 0


def test_read_tsv(tmp_path):
    p = tmp_path / "g.tsv"
    p.write_text("1\t2\t1.5\n2\t1\t1.5\n3\t1\t2.0\n")
    ei, w = read_tsv(p)
    np.testing.assert_array_equal(ei, [[0, 1, 2], [1, 0, 0]])
    np.testing.assert_allclose(w, [1.5, 1.5, 2.0])
