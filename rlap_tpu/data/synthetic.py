"""Synthetic graph generators.

The reference's unit tests build Barabási–Albert graphs
(`tests/test_rlap.py:25-31` via networkx) and its recipes run on Planetoid /
TU datasets. This environment has no dataset downloads, so tests and
benchmarks here use deterministic generators: BA for structural parity with
the reference tests, and stochastic block models with community-correlated
features so classification recipes have a learnable signal end-to-end.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rlap_tpu.core.graph import Graph


def barabasi_albert(n: int, m: int, seed: int = 0,
                    edge_capacity: Optional[int] = None) -> Graph:
    """Undirected BA preferential-attachment graph as a symmetric Graph.

    The repeated-nodes pool is a preallocated array (a growing Python list
    fed to `rng.choice` re-converts O(len) per step -> O(n^2) overall,
    minutes at n=20k). Draw-for-draw identical to the list version for a
    given seed, so generated graphs are unchanged.
    """
    rng = np.random.default_rng(seed)
    targets = np.arange(m, dtype=np.int64)
    rep = np.empty(2 * m * max(n - m, 1), dtype=np.int64)
    pos = 0
    src = np.empty(m * max(n - m, 1), dtype=np.int64)
    dst = np.empty(m * max(n - m, 1), dtype=np.int64)
    e = 0
    for v in range(m, n):
        k = len(targets)
        src[e:e + k] = v
        dst[e:e + k] = targets
        e += k
        rep[pos:pos + k] = targets
        rep[pos + k:pos + 2 * k] = v
        pos += 2 * k
        targets = rng.choice(rep[:pos], size=m)
    pairs = np.unique(np.stack([np.concatenate([src[:e], dst[:e]]),
                                np.concatenate([dst[:e], src[:e]])], 1),
                      axis=0)
    return Graph.from_edges(pairs[:, 0].astype(np.int32),
                            pairs[:, 1].astype(np.int32),
                            num_nodes=n, edge_capacity=edge_capacity)


def erdos_renyi(n: int, p: float, seed: int = 0,
                edge_capacity: Optional[int] = None) -> Graph:
    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    a = np.triu(a, 1)
    s, r = np.nonzero(a | a.T)
    return Graph.from_edges(s.astype(np.int32), r.astype(np.int32),
                            num_nodes=n, edge_capacity=edge_capacity)


def sbm(n: int, num_blocks: int, p_in: float, p_out: float, seed: int = 0,
        edge_capacity: Optional[int] = None):
    """Stochastic block model. Returns (Graph, labels[int32 n])."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_blocks, size=n).astype(np.int32)
    same = labels[:, None] == labels[None, :]
    prob = np.where(same, p_in, p_out)
    a = rng.random((n, n)) < prob
    a = np.triu(a, 1)
    s, r = np.nonzero(a | a.T)
    g = Graph.from_edges(s.astype(np.int32), r.astype(np.int32),
                         num_nodes=n, edge_capacity=edge_capacity)
    return g, labels


def synthetic_node_dataset(n: int = 512, num_classes: int = 4,
                           feature_dim: int = 64, p_in: float = 0.05,
                           p_out: float = 0.005, noise: float = 0.6,
                           seed: int = 0,
                           edge_capacity: Optional[int] = None):
    """SBM graph + noisy class-indicator features: a learnable Cora stand-in.

    Returns (Graph with .x, labels).
    """
    rng = np.random.default_rng(seed + 1)
    g, labels = sbm(n, num_classes, p_in, p_out, seed=seed,
                    edge_capacity=edge_capacity)
    centers = rng.normal(size=(num_classes, feature_dim)).astype(np.float32)
    x = centers[labels] + noise * rng.normal(size=(n, feature_dim)).astype(
        np.float32)
    # row-normalize, like PyG's NormalizeFeatures transform the reference
    # applies to every Planetoid/Coauthor/Amazon dataset (node_shared.py:308-322)
    x = x / np.maximum(np.abs(x).sum(axis=1, keepdims=True), 1e-12)
    return g.replace(x=x), labels


def synthetic_graph_dataset(num_graphs: int = 64, n_lo: int = 10, n_hi: int = 30,
                            num_classes: int = 2, feature_dim: int = 8,
                            seed: int = 0):
    """A TU-style list of small graphs with graph-level labels.

    Class 0 graphs are sparse ER; class 1 graphs are denser ER — so density
    carries the label, learnable by sum-pooled GIN.
    """
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for i in range(num_graphs):
        y = i % num_classes
        n = int(rng.integers(n_lo, n_hi))
        p = 0.12 + 0.25 * y / max(num_classes - 1, 1)
        g = erdos_renyi(n, p, seed=int(rng.integers(1 << 31)))
        x = np.ones((n, feature_dim), np.float32)
        graphs.append(g.replace(x=x))
        labels.append(y)
    return graphs, np.asarray(labels, np.int32)
