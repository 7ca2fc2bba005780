"""Core Graph container tests (padding, coalesce, symmetry, degrees).

Analogue of the reference's marshalling test `tests/test_rlap.py:12-20`
(`TestIdentity` round-trips tensors through the Eigen boundary): here the
boundary under test is numpy -> padded COO -> ops -> numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.data.synthetic import barabasi_albert


def test_from_edges_roundtrip():
    s = [0, 1, 2, 2]
    r = [1, 0, 0, 1]
    g = Graph.from_edges(s, r, num_nodes=3, weights=[1.0, 2.0, 3.0, 4.0])
    assert g.edge_capacity == 128
    assert int(g.num_edges) == 4
    m = np.asarray(g.edge_mask)
    np.testing.assert_array_equal(np.asarray(g.senders)[m], s)
    np.testing.assert_array_equal(np.asarray(g.weights)[m], [1, 2, 3, 4])
    # padding is the sentinel node with zero weight
    assert np.all(np.asarray(g.senders)[~m] == 3)
    assert np.all(np.asarray(g.weights)[~m] == 0)


def test_coalesce_merges_duplicates():
    g = Graph.from_edges([0, 0, 1, 0], [1, 1, 2, 1], num_nodes=3,
                         weights=[1.0, 2.0, 5.0, 3.0])
    c = G.coalesce(g)
    assert int(c.num_edges) == 2
    d = np.asarray(G.to_dense(c))
    assert d[0, 1] == 6.0
    assert d[1, 2] == 5.0


def test_to_undirected_symmetric():
    g = barabasi_albert(50, 3, seed=1)
    d = np.asarray(G.to_dense(g))
    np.testing.assert_allclose(d, d.T)
    u = G.to_undirected(g)
    du = np.asarray(G.to_dense(u))
    np.testing.assert_allclose(du, d)


def test_self_loops():
    g = Graph.from_edges([0, 1], [1, 0], num_nodes=3)
    g2 = G.add_self_loops(g)
    d = np.asarray(G.to_dense(g2))
    np.testing.assert_allclose(np.diag(d), 1.0)
    g3 = G.remove_self_loops(g2)
    np.testing.assert_allclose(np.asarray(G.to_dense(g3)), np.asarray(G.to_dense(g)))


def test_degrees():
    g = barabasi_albert(40, 2, seed=0)
    deg = np.asarray(G.degrees(g))
    d = np.asarray(G.to_dense(g))
    np.testing.assert_allclose(deg, (d > 0).sum(axis=1))


def test_laplacian():
    g = barabasi_albert(30, 2, seed=3)
    lap = np.asarray(G.laplacian_dense(g))
    np.testing.assert_allclose(lap.sum(axis=1), 0, atol=1e-6)
    np.testing.assert_allclose(lap, lap.T)


def test_block_diagonal():
    gs = [barabasi_albert(10, 2, seed=i) for i in range(3)]
    gs = [g.replace(x=jnp.ones((10, 4))) for g in gs]
    batch, seg = G.block_diagonal(gs, node_capacity=40, edge_capacity=256)
    assert batch.num_nodes == 40
    assert int(batch.num_real_nodes) == 30
    seg = np.asarray(seg)
    np.testing.assert_array_equal(seg[:30], np.repeat([0, 1, 2], 10))
    assert np.all(seg[30:] == 3)
    d = np.asarray(G.to_dense(batch))
    # no cross-graph edges
    assert d[:10, 10:].sum() == 0
    assert d[10:20, 20:].sum() == 0


def test_sort_and_with_capacity():
    g = Graph.from_edges([2, 0, 1], [0, 1, 2], num_nodes=3, edge_capacity=8)
    gs = G.sort_edges(g)
    s = np.asarray(gs.senders)
    assert list(s[:3]) == [0, 1, 2]
    g2 = G.with_capacity(g, 16)
    assert g2.edge_capacity == 16
    assert int(g2.num_edges) == 3
