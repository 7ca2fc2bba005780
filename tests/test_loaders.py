"""Golden-file loader tests: parse committed fixture bytes of each real
on-disk format and assert the exact graphs/labels/splits.

Covers VERDICT.md item 7: the Planetoid pickle set, the GNN-benchmark npz,
and the TU text triple (reference consumers: `CCA-SSG/dataset.py:9-62`,
`scripts/graph_shared.py:209-218`).
"""

import os

import numpy as np
import pytest

from rlap_tpu.data.loaders import (load_npz_graph, load_planetoid, load_tu,
                                   normalize_features)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _edge_set(g):
    m = np.asarray(g.edge_mask)
    s = np.asarray(g.senders)[m]
    r = np.asarray(g.receivers)[m]
    return set(zip(s.tolist(), r.tolist()))


class TestPlanetoid:
    def test_parse(self):
        g, y, splits = load_planetoid(os.path.join(FIX, "planetoid"), "tiny")
        assert g.num_nodes == 8
        # features: rows 0..5 from allx, rows 6..7 from tx; row-normalized
        raw = np.zeros((8, 3), np.float32)
        raw[0, 0], raw[1, 1], raw[2, 2] = 1, 2, 3
        raw[3, 0], raw[4, 1], raw[5, 2] = 4, 5, 6
        raw[6, 0], raw[7, 1] = 9, 5
        np.testing.assert_allclose(np.asarray(g.x), normalize_features(raw),
                                   rtol=1e-6)
        np.testing.assert_array_equal(
            y, np.array([0, 1, 2, 0, 1, 2, 1, 0], np.int32))
        expect = {(0, 1), (1, 0), (0, 2), (2, 0), (2, 3), (3, 2),
                  (4, 5), (5, 4), (6, 7), (7, 6)}
        assert _edge_set(g) == expect
        # split masks: train = first |y| = 2 nodes; val = next 500 (clipped);
        # test = test.index
        np.testing.assert_array_equal(
            splits["train"], np.array([1, 1, 0, 0, 0, 0, 0, 0], bool))
        np.testing.assert_array_equal(
            splits["valid"], np.array([0, 0, 1, 1, 1, 1, 1, 1], bool))
        np.testing.assert_array_equal(
            splits["test"], np.array([0, 0, 0, 0, 0, 0, 1, 1], bool))


class TestNpz:
    def test_parse(self):
        g, y = load_npz_graph(os.path.join(FIX, "tiny_academic.npz"))
        assert g.num_nodes == 5
        np.testing.assert_array_equal(y, np.array([0, 1, 0, 1, 2], np.int32))
        # stored upper-triangle path 0-1-2-3-4 must come back symmetrized
        expect = {(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2),
                  (3, 4), (4, 3)}
        assert _edge_set(g) == expect
        raw = np.array([[1., 0.], [0., 2.], [3., 0.], [0., 4.], [5., 5.]],
                       np.float32)
        np.testing.assert_allclose(np.asarray(g.x), normalize_features(raw),
                                   rtol=1e-6)


class TestTU:
    def test_parse(self):
        graphs, y = load_tu(os.path.join(FIX, "TINY"), "TINY")
        assert len(graphs) == 2
        # graph labels {1, -1} map through sorted-unique to {1, 0}
        np.testing.assert_array_equal(y, np.array([1, 0], np.int32))
        g1, g2 = graphs
        assert g1.num_nodes == 3 and g2.num_nodes == 2
        assert _edge_set(g1) == {(0, 1), (1, 0), (1, 2), (2, 1),
                                 (0, 2), (2, 0)}
        assert _edge_set(g2) == {(0, 1), (1, 0)}
        # node labels one-hot over 3 classes
        np.testing.assert_array_equal(
            np.asarray(g1.x), np.eye(3, dtype=np.float32)[[0, 1, 2]])
        np.testing.assert_array_equal(
            np.asarray(g2.x), np.eye(3, dtype=np.float32)[[0, 1]])


class TestRegistryFallback:
    def test_synthetic_flag(self):
        from rlap_tpu.data.loaders import load_dataset

        with pytest.warns(UserWarning):
            g, y, meta = load_dataset("CORA", root="/nonexistent")
        assert meta["synthetic"] is True
        assert g.num_nodes > 0
