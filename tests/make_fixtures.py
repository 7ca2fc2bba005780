"""Generate the tiny golden dataset fixtures under tests/fixtures/.

Each fixture is a minimal but byte-faithful instance of a real on-disk
format the reference consumes (Planetoid pickles `CCA-SSG/dataset.py:9-62`
via PyG, GNN-benchmark npz, TU text triple `graph_shared.py:209-218`), so
the loader tests in test_loaders.py parse actual file bytes, not synthetic
fallbacks. Run from the repo root:  python tests/make_fixtures.py
"""

import os
import pickle

import numpy as np
import scipy.sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")


def make_planetoid():
    d = os.path.join(FIX, "planetoid")
    os.makedirs(d, exist_ok=True)
    # 8 nodes: 6 in allx (0..5), 2 test nodes (6, 7); 3 features; 3 classes
    allx = sp.csr_matrix(np.array([
        [1., 0., 0.],
        [0., 2., 0.],
        [0., 0., 3.],
        [4., 0., 0.],
        [0., 5., 0.],
        [0., 0., 6.],
    ], dtype=np.float32))
    tx = sp.csr_matrix(np.array([
        [9., 0., 0.],
        [0., 5., 0.],
    ], dtype=np.float32))
    x = sp.csr_matrix(allx.toarray()[:2])  # train-only features
    ally = np.eye(3, dtype=np.int32)[[0, 1, 2, 0, 1, 2]]
    ty = np.eye(3, dtype=np.int32)[[1, 0]]
    y = ally[:2]
    graph = {0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: [5], 5: [4],
             6: [7], 7: [6]}
    objs = {"x": x, "tx": tx, "allx": allx, "y": y, "ty": ty, "ally": ally,
            "graph": graph}
    for suf, obj in objs.items():
        with open(os.path.join(d, f"ind.tiny.{suf}"), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(d, "ind.tiny.test.index"), "w") as f:
        f.write("6\n7\n")


def make_npz():
    d = FIX
    os.makedirs(d, exist_ok=True)
    # 5-node path graph 0-1-2-3-4 (upper triangle only; loader symmetrizes)
    adj = sp.csr_matrix(
        (np.ones(4), (np.arange(4), np.arange(1, 5))), shape=(5, 5))
    attr = sp.csr_matrix(np.array([
        [1., 0.], [0., 2.], [3., 0.], [0., 4.], [5., 5.],
    ], dtype=np.float32))
    labels = np.array([0, 1, 0, 1, 2], np.int64)
    np.savez(os.path.join(d, "tiny_academic.npz"),
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
             labels=labels)


def make_tu():
    d = os.path.join(FIX, "TINY", "TINY")
    os.makedirs(d, exist_ok=True)
    # graph 1: triangle on nodes 1..3; graph 2: edge on nodes 4..5 (1-indexed)
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 5), (5, 4)]
    with open(os.path.join(d, "TINY_A.txt"), "w") as f:
        for a, b in edges:
            f.write(f"{a}, {b}\n")
    with open(os.path.join(d, "TINY_graph_indicator.txt"), "w") as f:
        f.write("1\n1\n1\n2\n2\n")
    with open(os.path.join(d, "TINY_graph_labels.txt"), "w") as f:
        f.write("1\n-1\n")
    with open(os.path.join(d, "TINY_node_labels.txt"), "w") as f:
        f.write("0\n1\n2\n0\n1\n")


if __name__ == "__main__":
    make_planetoid()
    make_npz()
    make_tu()
    print(f"fixtures written under {FIX}")
