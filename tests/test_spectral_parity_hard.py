"""Hardened spectral-expectation parity vs the sequential C++ oracle
(VERDICT.md item 5): 20 seeds, three graph families, <= 15% bands, an
n=1000-scale one-shot check, and iterated-elimination TRAJECTORY parity —
the reference's actual validation protocol (`scripts/rlap_vc_spectral.py:
61-116`: batch_count steps of batch_frac eliminations, max-SV and
edge-count curves).

Measured deltas for calibration (tools, 20 seeds): max-SV within 3.5%,
total weight within 3.4%, edge counts within 6.8% across BA/ER/SBM — so a
15% band catches any systematic weight bias well below the 15-20% level
the round-1 bands would have missed.
"""

import numpy as np
import pytest

import jax

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.data.synthetic import barabasi_albert, sbm
from rlap_tpu.native import oracle_approximate_cholesky
from rlap_tpu.ops.rlap import approximate_cholesky


def er_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    a = np.triu(rng.random((n, n)) < p, 1)
    s, r = np.nonzero(a)
    return Graph.from_edges(np.concatenate([s, r]), np.concatenate([r, s]),
                            num_nodes=n)


def _dense_stats(d):
    sv = np.linalg.svd(d, compute_uv=False)[0] if d.any() else 0.0
    return np.array([sv, (d > 0).sum(), d.sum()])


def _kernel_stats(g, t, seed, o_v="random", o_n="random", **kw):
    out = approximate_cholesky(g, jax.random.PRNGKey(seed), t, o_v=o_v,
                               o_n=o_n, **kw)
    return _dense_stats(np.asarray(G.to_dense(out)))


def _edges_np(g):
    m = np.asarray(g.edge_mask)
    return (np.stack([np.asarray(g.senders)[m],
                      np.asarray(g.receivers)[m]]),
            np.asarray(g.weights)[m])


def _oracle_stats(g, t, seed, o_v="random", o_n="random"):
    ei, w = _edges_np(g)
    oi, ow = oracle_approximate_cholesky(ei, w, g.num_nodes, t,
                                         o_v=o_v, o_n=o_n,
                                         seed=seed)
    d = np.zeros((g.num_nodes, g.num_nodes))
    d[oi[0], oi[1]] = ow
    return _dense_stats(d)


FAMILIES = {
    "ba": lambda: barabasi_albert(128, 3, seed=1),
    "er": lambda: er_graph(128, 0.06, 2),
    "sbm": lambda: sbm(128, 4, 0.15, 0.02, seed=3)[0],
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_parity_20_seeds(family):
    g = FAMILIES[family]()
    t = g.num_nodes // 2
    ks = np.mean([_kernel_stats(g, t, s) for s in range(20)], axis=0)
    os_ = np.mean([_oracle_stats(g, t, s) for s in range(20)], axis=0)
    for i, name in enumerate(("max_sv", "edges", "wsum")):
        assert abs(ks[i] - os_[i]) / os_[i] < 0.15, (
            family, name, ks[i], os_[i])


def test_parity_n1000():
    g = barabasi_albert(1000, 4, seed=5)
    t = 500
    ks = np.mean([_kernel_stats(g, t, s) for s in range(5)], axis=0)
    os_ = np.mean([_oracle_stats(g, t, s) for s in range(5)], axis=0)
    for i, name in enumerate(("max_sv", "edges", "wsum")):
        assert abs(ks[i] - os_[i]) / os_[i] < 0.15, (name, ks[i], os_[i])


MODES = [
    # every non-default (o_v, o_n) pair the kernel dispatches differently
    # (VERDICT r2 weak #5): degree + coarsen orderings ride the staged
    # kernel's budget/trim paths, asc/desc ride the extra tail sort.
    # coarsen forces o_n="random" (preconditioner.cc:830-833).
    ("degree", "random"), ("degree", "asc"), ("degree", "desc"),
    ("coarsen", "random"), ("random", "asc"), ("random", "desc"),
]


@pytest.mark.parametrize("o_v,o_n", MODES)
def test_mode_parity_n512_20_seeds(o_v, o_n):
    """20-seed, <=15%-band parity for the non-default orderings at n=512 —
    a systematic per-mode weight bias (e.g. in the degree-budget trim or
    the asc/desc tail sort) shifts max-SV/weight well past the band.
    Matches `preconditioner.cc:295-307` (o_n ordering) and `:886-912`
    (coarsen rewire)."""
    g = barabasi_albert(512, 4, seed=9)
    t = 256
    ks = np.mean([_kernel_stats(g, t, s, o_v, o_n) for s in range(20)],
                 axis=0)
    os_ = np.mean([_oracle_stats(g, t, s, o_v, o_n) for s in range(20)],
                  axis=0)
    for i, name in enumerate(("max_sv", "edges", "wsum")):
        assert abs(ks[i] - os_[i]) / os_[i] < 0.15, (
            o_v, o_n, name, ks[i], os_[i])


def test_degree_trajectory_parity():
    """Iterated-elimination trajectory parity for o_v="degree" (the
    reference's protocol, `rlap_vc_spectral.py:61-116`, run for the
    min-degree ordering): per-step max-SV and edge-count curves of the
    kernel vs the oracle, mean over runs."""
    n, runs, steps = 128, 6, 4
    g = barabasi_albert(n, 3, seed=17)
    per_step = int(0.4 / steps * n)

    k_sv = np.zeros((runs, steps))
    k_edges = np.zeros((runs, steps))
    for run in range(runs):
        cur = g
        for step in range(steps):
            cur = approximate_cholesky(
                cur, jax.random.PRNGKey(1000 * run + step), per_step,
                o_v="degree")
            d = np.asarray(G.to_dense(cur))
            st = _dense_stats(d)
            k_sv[run, step], k_edges[run, step] = st[0], st[1]

    o_sv = np.zeros((runs, steps))
    o_edges = np.zeros((runs, steps))
    for run in range(runs):
        ei, w = _edges_np(g)
        for step in range(steps):
            ei, w = oracle_approximate_cholesky(
                ei, w, n, per_step, o_v="degree", o_n="random",
                seed=2000 * run + step)
            d = np.zeros((n, n))
            d[ei[0], ei[1]] = w
            st = _dense_stats(d)
            o_sv[run, step], o_edges[run, step] = st[0], st[1]

    for s in range(steps):
        ksv, osv = k_sv[:, s].mean(), o_sv[:, s].mean()
        ke, oe = k_edges[:, s].mean(), o_edges[:, s].mean()
        assert abs(ksv - osv) / osv < 0.15, (s, ksv, osv)
        assert abs(ke - oe) / oe < 0.15, (s, ke, oe)


def test_iterated_trajectory_parity():
    """The reference's validation: iterate the elimination in batch_count
    steps and compare the per-step max-SV and edge-count curves
    (`rlap_vc_spectral.py:61-116`, batch_count=10, total frac 0.5)."""
    from rlap_tpu.bench.spectral import iterated_rlap_curves

    n, runs, steps = 128, 6, 5
    g = barabasi_albert(n, 3, seed=7)
    per_step = int(0.5 / steps * n)

    k = iterated_rlap_curves(g, total_frac=0.5, batch_count=steps,
                             num_runs=runs, seed=0)

    # oracle trajectories: feed its output back per step
    o_sv = np.zeros((runs, steps + 1))
    o_edges = np.zeros((runs, steps + 1))
    for run in range(runs):
        ei, w = _edges_np(g)
        d0 = np.zeros((n, n))
        d0[ei[0], ei[1]] = w
        o_sv[run, 0] = np.linalg.svd(d0, compute_uv=False)[0]
        o_edges[run, 0] = (d0 > 0).sum()
        for step in range(steps):
            ei, w = oracle_approximate_cholesky(
                ei, w, n, per_step, o_v="random", o_n="random",
                seed=1000 * run + step)
            d = np.zeros((n, n))
            d[ei[0], ei[1]] = w
            o_sv[run, step + 1] = np.linalg.svd(d, compute_uv=False)[0]
            o_edges[run, step + 1] = (d > 0).sum()

    # pointwise parity of the mean curves (skip step 0: identical inputs)
    for s in range(1, steps + 1):
        ksv, osv = k["max_sv_mean"][s], o_sv[:, s].mean()
        ke, oe = k["edges_mean"][s], o_edges[:, s].mean()
        assert abs(ksv - osv) / osv < 0.15, (s, ksv, osv)
        assert abs(ke - oe) / oe < 0.15, (s, ke, oe)


def test_parity_n2000_restricted_selection():
    """Parity at a size whose pool exceeds the stage floor, so the
    class-partitioned kernel actually runs Luby selection on the
    restricted S = e_t + B_cap prefix (S < P at both stages for this
    shape) — the smaller parity sizes degenerate to S = P and would not
    catch a both-pending slot escaping the selection prefix. ER graph:
    BA max-SV at this size is bimodal on the top hub's survival coin,
    which a 5-seed mean cannot resolve (the hub case is covered by
    test_hub_graph_no_overflow)."""
    g = er_graph(2000, 0.008, 31)
    t = 1000
    ks = np.mean([_kernel_stats(g, t, s) for s in range(5)], axis=0)
    os_ = np.mean([_oracle_stats(g, t, s) for s in range(5)], axis=0)
    for i, name in enumerate(("max_sv", "edges", "wsum")):
        assert abs(ks[i] - os_[i]) / os_[i] < 0.15, (name, ks[i], os_[i])


def test_hub_graph_elimination_contract():
    """A pending high-degree hub must never silently survive. Raw
    `eliminate` either removes all t targets or raises the overflow flag
    (a hub's endgame column can outgrow the touched budget — the
    documented escalate-to-uncapped contract), and the public
    `approximate_cholesky` path, which escalates on overflow, always
    eliminates exactly the targeted set — hubs included. Regression test
    for the bug where hub-pending seeds tripped a selection-prefix cap
    and reported removed = t - 1 with the hub surviving and no recovery
    path."""
    import jax

    from rlap_tpu.ops.rlap import approximate_cholesky, eliminate

    g = barabasi_albert(2000, 8, seed=21)
    deg = np.bincount(np.asarray(g.senders)[np.asarray(g.edge_mask)],
                      minlength=2000)
    hub = int(np.argmax(deg))
    t = 1000
    for s in range(6):
        _, removed, overflow = eliminate(g, jax.random.PRNGKey(s), t)
        assert int(removed) == t or bool(overflow), (s, int(removed))
        out = approximate_cholesky(g, jax.random.PRNGKey(s), t)
        m = np.asarray(out.edge_mask)
        wdeg = np.zeros(2000)
        np.add.at(wdeg, np.asarray(out.senders)[m],
                  np.asarray(out.weights)[m])
        # recompute this seed's pending set the way the kernel does
        key, kperm = jax.random.split(jax.random.PRNGKey(s))
        perm = np.asarray(jax.random.permutation(kperm, 2000))
        pos = np.zeros(2000, np.int64)
        pos[perm] = np.arange(2000)
        if pos[hub] < t:
            assert wdeg[hub] == 0.0, (s, wdeg[hub])
        else:
            assert wdeg[hub] > 0.0, s


@pytest.mark.parametrize("o_v,o_n", [("random", "asc"), ("random", "desc"),
                                     ("degree", "random"),
                                     ("coarsen", "random")])
def test_mode_parity_restricted_prefix(o_v, o_n):
    """Non-default modes at a size where the pool exceeds the stage floor:
    o_v="random" rides the restricted selection prefix with the o_n tail
    sort, and degree/coarsen (S = P by construction) still cross the
    class-partitioned sort/orientation machinery at multi-stage sizes —
    none of which the n<=1000 mode tests reach."""
    g = er_graph(2000, 0.008, 33)
    t = 1000
    ks = np.mean([_kernel_stats(g, t, s, o_v, o_n) for s in range(4)],
                 axis=0)
    os_ = np.mean([_oracle_stats(g, t, s, o_v, o_n) for s in range(4)],
                  axis=0)
    for i, name in enumerate(("max_sv", "edges", "wsum")):
        assert abs(ks[i] - os_[i]) / os_[i] < 0.15, (
            o_v, o_n, name, ks[i], os_[i])
