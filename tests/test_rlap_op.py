"""Tests of the rLap elimination op, mirroring the reference's
`tests/test_rlap.py:23-65` (`TestApproximateCholesky`) invariants plus
conservation properties of the closed-form clique sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import barabasi_albert
from rlap_tpu.ops.rlap import approximate_cholesky


def _symmetry_check(g):
    d = np.asarray(G.to_dense(g))
    np.testing.assert_allclose(d, d.T, atol=1e-5)


@pytest.mark.parametrize("o_v", ["random", "degree", "coarsen"])
@pytest.mark.parametrize("o_n", ["asc", "desc", "random"])
def test_output_symmetric_and_sized(o_v, o_n):
    # the reference test: BA(100) graph, num_remove=50, repeated for
    # stochasticity (test_rlap.py:48-65). We sweep all (o_v, o_n).
    g = barabasi_albert(100, 3, seed=7)
    key = jax.random.PRNGKey(0)
    out = approximate_cholesky(g, key, 50, o_v=o_v, o_n=o_n)
    _symmetry_check(out)
    # eliminated nodes have no incident edges
    deg = np.asarray(G.degrees(out))
    survivors = (deg > 0).sum()
    assert survivors <= 100
    # weights stay positive
    w = np.asarray(out.weights)[np.asarray(out.edge_mask)]
    assert (w > 0).all()


def test_eliminates_requested_count():
    g = barabasi_albert(100, 2, seed=3)
    key = jax.random.PRNGKey(1)
    out = approximate_cholesky(g, key, 60, o_v="random", o_n="random")
    # exactly 60 vertices eliminated: they have no edges left, and since the
    # input BA graph is connected, all survivors keep at least one edge.
    deg = np.asarray(G.degrees(out))
    assert (deg > 0).sum() == 40


def test_num_remove_zero_is_identity():
    g = barabasi_albert(50, 2, seed=0)
    out = approximate_cholesky(g, jax.random.PRNGKey(0), 0)
    np.testing.assert_allclose(
        np.asarray(G.to_dense(out)), np.asarray(G.to_dense(g)), atol=1e-6)


def test_single_elimination_exact_weights():
    """Eliminating one vertex: new clique edge weights must satisfy the
    closed form w_new_j = v_j * S_j / csum, and per-column total weight must
    follow the reference recurrence. Checked on a star graph where the
    answer is deterministic up to partner choice.
    """
    # star: center 0 connected to 1,2,3 with weights 3,2,1
    s = [0, 0, 0, 1, 2, 3]
    r = [1, 2, 3, 0, 0, 0]
    w = [3.0, 2.0, 1.0, 3.0, 2.0, 1.0]
    g = G.Graph.from_edges(s, r, num_nodes=4, weights=w)
    # eliminate exactly vertex 0: with num_remove=1 and random order there is
    # a 1/4 chance per try; instead use degree ordering? center has max
    # degree. Use many seeds and only check runs that eliminated vertex 0.
    seen = 0
    for seed in range(20):
        out = approximate_cholesky(g, jax.random.PRNGKey(seed), 1,
                                   o_v="random", o_n="asc")
        d = np.asarray(G.to_dense(out))
        if d[0].sum() != 0:
            continue  # a leaf was eliminated instead
        seen += 1
        # center eliminated: asc order = weights [1,2,3] (nodes 3,2,1),
        # csum=6. w_new_0 = 1*(6-1)/6 = 5/6 ; w_new_1 = 2*(6-1-2)/6 = 1.
        # partner of j is sampled from the suffix, so the clique has exactly
        # two new undirected edges with weights {5/6, 1}.
        vals = sorted(set(np.round(d[d > 0], 5)))
        np.testing.assert_allclose(vals, [np.round(5 / 6, 5), 1.0])
    assert seen > 0


def test_total_weight_conservation_random():
    """Sum of edge weights after eliminating one vertex of weighted degree
    wdeg changes by exactly the Schur-complement amount in expectation:
    each elimination removes wdeg and adds sum_j v_j S_j / csum.
    Deterministically (not just in expectation) the added total is
    sum_j v_j (csum - cum_j) / csum.
    """
    g = barabasi_albert(60, 3, seed=5)
    w_in = float(np.asarray(g.weights).sum())
    out = approximate_cholesky(g, jax.random.PRNGKey(2), 1, o_v="random",
                               o_n="random")
    w_out = float(np.asarray(out.weights).sum())
    # weight strictly decreases, by at most the largest weighted degree
    wdeg = np.asarray(G.weighted_degrees(g))
    assert w_out < w_in
    assert w_in - w_out <= 2 * wdeg.max() + 1e-4


def test_coarsen_harmonic_weights():
    """Coarsening one node of a uniform-weight 4-cycle: the eliminated node
    collapses onto one sampled neighbor and its other neighbor is rewired
    with harmonic weight w*w/(w+w) (preconditioner.cc:897). For the cycle
    0-1-2-3-0 with all weights 2, whichever node is eliminated, the result
    is a path with weights {2, 2} plus one new edge of weight 1.
    """
    s = [0, 1, 1, 2, 2, 3, 3, 0]
    r = [1, 0, 2, 1, 3, 2, 0, 3]
    w = [2.0] * 8
    g = G.Graph.from_edges(s, r, num_nodes=4, weights=w)
    out = approximate_cholesky(g, jax.random.PRNGKey(4), 1,
                               o_v="coarsen", o_n="random")
    d = np.asarray(G.to_dense(out))
    np.testing.assert_allclose(d, d.T, atol=1e-6)
    vals = d[np.triu_indices(4, 1)]
    vals = np.sort(vals[vals > 0])
    np.testing.assert_allclose(vals, [1.0, 2.0, 2.0], rtol=1e-5)


def test_jit_composable():
    """The core `eliminate` is jittable with traced num_remove."""
    from rlap_tpu.ops.rlap import eliminate

    g = barabasi_albert(64, 2, seed=1)

    @jax.jit
    def run(g, key, t):
        out, removed, overflow = eliminate(g, key, t, b_cap=64, d_cap=64)
        return out.weights.sum(), removed, overflow

    wsum, removed, overflow = run(g, jax.random.PRNGKey(0), 20)
    assert int(removed) == 20
    assert not bool(overflow)
    assert float(wsum) > 0


def _sym_invariants(out, n, t, removed):
    s = np.asarray(out.senders)
    r = np.asarray(out.receivers)
    w = np.asarray(out.weights)
    m = s < n
    s, r, w = s[m], r[m], w[m]
    assert (w > 0).all()
    fwd = {}
    for a, b, c in zip(s.tolist(), r.tolist(), w.tolist()):
        fwd[(a, b)] = fwd.get((a, b), 0.0) + c
    assert all(abs(fwd[(a, b)] - fwd.get((b, a), -1.0)) < 1e-3 for a, b in fwd)
    assert int(removed) == t
    assert np.unique(np.concatenate([s, r])).shape[0] == n - t


@pytest.mark.parametrize("o_n", ["asc", "desc"])
def test_o_n_ordered_fast_path(o_n):
    """asc/desc run on the staged kernel (the column-order sort of merged
    run tails, compressColumn's o_n sort `preconditioner.cc:295-307`)."""
    from rlap_tpu.ops.rlap import eliminate

    g = barabasi_albert(300, 4, seed=2)
    out, removed, _ = eliminate(g, jax.random.PRNGKey(3), 90, o_n=o_n)
    _sym_invariants(out, 300, 90, removed)


def test_unpacked_large_n():
    """n beyond the int32 key-packing bound (n*(n+2) >= 2^31) routes to the
    two-key sorts; a 47k ring stays a ring under elimination."""
    from rlap_tpu.ops.rlap import eliminate

    n, t = 47000, 20000
    idx = np.arange(n, dtype=np.int32)
    s = np.concatenate([idx, (idx + 1) % n])
    r = np.concatenate([(idx + 1) % n, idx])
    g = G.Graph(senders=jnp.asarray(s), receivers=jnp.asarray(r),
                weights=jnp.ones(2 * n, jnp.float32), num_nodes=n)
    out, removed, _ = eliminate(g, jax.random.PRNGKey(5), t)
    _sym_invariants(out, n, t, removed)
    live = int(np.sum(np.asarray(out.senders) < n))
    assert live == 2 * (n - t)  # a ring's Schur complement is a ring


def test_incremental_degree_exactness():
    """Incremental degree maintenance (decrement touched copies,
    increment emissions) must reproduce the per-round full recompute
    BIT-EXACTLY: degrees drive the (deg, pos) selection priorities and
    the budget trim, so any drift changes the elimination schedule.
    Regression test for the bug where untouched pass-through slots in
    the prefix were re-counted as emissions every round."""
    import rlap_tpu.ops.rlap as R
    from rlap_tpu.data.synthetic import barabasi_albert

    g = barabasi_albert(2000, 8, seed=11)
    outs = []
    try:
        for flag in (False, True):
            R._RECOMPUTE_DEG = flag
            R.eliminate.clear_cache()
            res = []
            for s in range(2):
                out, removed, ovf = R.eliminate(
                    g, jax.random.PRNGKey(s), 1000)
                res.append((np.asarray(out.senders), np.asarray(out.weights),
                            int(removed), bool(ovf)))
            outs.append(res)
    finally:
        R._RECOMPUTE_DEG = False
        R.eliminate.clear_cache()
    for (s0, w0, r0, o0), (s1, w1, r1, o1) in zip(*outs):
        assert r0 == r1 and o0 == o1
        np.testing.assert_array_equal(s0, s1)
        np.testing.assert_allclose(w0, w1, rtol=1e-6)


def test_eliminate_pair_exact_parity():
    """eliminate_pair shares the entry canonicalization across two views
    but keeps each view's stream byte-identical to a single eliminate call
    with the same subkey — parity is exact, not statistical."""
    import rlap_tpu.ops.rlap as R

    g = barabasi_albert(1500, 6, seed=4)
    key = jax.random.PRNGKey(9)
    (g1, rm1, ov1), (g2, rm2, ov2) = R.eliminate_pair(g, key, 700)
    k1, k2 = jax.random.split(key)
    for (gp, rmp, ovp), kv in (((g1, rm1, ov1), k1), ((g2, rm2, ov2), k2)):
        ref, rmr, ovr = R.eliminate(g, kv, 700)
        assert int(rmp) == int(rmr) == 700
        assert bool(ovp) == bool(ovr)
        np.testing.assert_array_equal(np.asarray(gp.senders),
                                      np.asarray(ref.senders))
        np.testing.assert_allclose(np.asarray(gp.weights),
                                   np.asarray(ref.weights), rtol=1e-6)
    # and the two views are genuinely different draws
    assert not np.array_equal(np.asarray(g1.senders), np.asarray(g2.senders))
