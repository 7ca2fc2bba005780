"""Distributed rLap: parity of the sharded kernel with the single-device
kernel on the virtual 8-device CPU mesh (VERDICT.md item 2).

Checks, at n=4096 (the dryrun scale):
* structural invariants of the sharded Schur complement: symmetry of the
  union edge list, positive weights, eliminated nodes absent, no overflow;
* spectral-expectation parity with the single-device kernel: total weight
  and max singular value agree within a few percent over seeds (both
  kernels sample the same distribution, so the means must match).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import barabasi_albert
from rlap_tpu.ops.rlap import eliminate
from rlap_tpu.parallel.partition import partition_edges_by_sender
from rlap_tpu.parallel.rlap_dist import eliminate_sharded


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()[:N_DEV]
    assert len(devs) == N_DEV, "conftest must force 8 virtual CPU devices"
    return Mesh(np.asarray(devs), ("data",))


def _stats(g: G.Graph):
    gg = G.drop_zero_weight(G.coalesce(g))
    m = np.asarray(gg.edge_mask)
    s = np.asarray(gg.senders)[m]
    r = np.asarray(gg.receivers)[m]
    w = np.asarray(gg.weights)[m]
    a = np.zeros((g.num_nodes, g.num_nodes))
    a[s, r] = w
    sv = np.linalg.svd(a, compute_uv=False)[0]
    return dict(edges=m.sum(), wsum=w.sum(), max_sv=sv,
                s=s, r=r, w=w)


class TestShardedParity:
    def test_invariants_and_parity(self, mesh):
        n, t = 512, 256
        g = barabasi_albert(n, 6, seed=3)
        gp = partition_edges_by_sender(g, N_DEV)

        sh_stats, sd_stats = [], []
        for seed in range(4):
            key = jax.random.PRNGKey(seed)
            out, removed, overflow = eliminate_sharded(gp, key, t, mesh)
            assert not bool(overflow)
            assert int(removed) == t
            st = _stats(out)
            # symmetry + positivity + eliminated nodes absent
            fwd = set(zip(st["s"].tolist(), st["r"].tolist()))
            assert all((b, a) in fwd for a, b in fwd)
            assert (st["w"] > 0).all()
            surv = set(st["s"].tolist())
            assert len(surv) <= n - t
            sh_stats.append(st)

            out1, removed1, _ = eliminate(g, key, t, o_v="random",
                                          o_n="random")
            assert int(removed1) == t
            sd_stats.append(_stats(out1))

        mean = lambda xs, k: float(np.mean([x[k] for x in xs]))
        # spectral-expectation parity: the two kernels sample the same
        # distribution, so means over seeds must agree closely
        assert mean(sh_stats, "wsum") == pytest.approx(
            mean(sd_stats, "wsum"), rel=0.10)
        assert mean(sh_stats, "max_sv") == pytest.approx(
            mean(sd_stats, "max_sv"), rel=0.10)
        assert mean(sh_stats, "edges") == pytest.approx(
            mean(sd_stats, "edges"), rel=0.15)

    def test_dryrun_scale(self, mesh):
        # the VERDICT bar: the sharded kernel runs at n >= 4096
        n, t = 4096, 2048
        g = barabasi_albert(n, 4, seed=0)
        gp = partition_edges_by_sender(g, N_DEV)
        out, removed, overflow = eliminate_sharded(
            gp, jax.random.PRNGKey(0), t, mesh)
        assert int(removed) == t
        assert not bool(overflow)
        gg = G.drop_zero_weight(G.coalesce(out))
        assert int(gg.num_edges) > 0

    def test_all_mode_combinations_parity(self, mesh):
        """All 9 (o_v, o_n) combos run sharded at n=512 and match the
        single-chip kernel in spectral expectation (VERDICT r4 item 6).
        o_n orders each eliminated column before the suffix-CDF pass
        (`preconditioner.cc:295-307`); coarsen forces o_n="random" in
        both kernels (cc:830-833)."""
        n, t = 512, 256
        g = barabasi_albert(n, 4, seed=2)
        gp = partition_edges_by_sender(g, N_DEV)
        seeds = 3
        for o_v in ("random", "degree", "coarsen"):
            for o_n in ("asc", "desc", "random"):
                sh, sd = [], []
                for seed in range(seeds):
                    key = jax.random.PRNGKey(100 + seed)
                    out, removed, overflow = eliminate_sharded(
                        gp, key, t, mesh, o_v=o_v, o_n=o_n)
                    assert int(removed) == t, (o_v, o_n)
                    assert not bool(overflow), (o_v, o_n)
                    st = _stats(out)
                    fwd = set(zip(st["s"].tolist(), st["r"].tolist()))
                    assert all((b, a) in fwd for a, b in fwd), (o_v, o_n)
                    assert (st["w"] > 0).all(), (o_v, o_n)
                    sh.append(st)
                    out1, removed1, _ = eliminate(g, key, t, o_v=o_v,
                                                  o_n=o_n)
                    assert int(removed1) == t, (o_v, o_n)
                    sd.append(_stats(out1))
                mean = lambda xs, k: float(np.mean([x[k] for x in xs]))
                assert mean(sh, "wsum") == pytest.approx(
                    mean(sd, "wsum"), rel=0.12), (o_v, o_n)
                assert mean(sh, "max_sv") == pytest.approx(
                    mean(sd, "max_sv"), rel=0.12), (o_v, o_n)

    def test_degree_and_coarsen_modes(self, mesh):
        n, t = 256, 128
        g = barabasi_albert(n, 4, seed=1)
        gp = partition_edges_by_sender(g, N_DEV)
        for o_v in ("degree", "coarsen"):
            out, removed, overflow = eliminate_sharded(
                gp, jax.random.PRNGKey(2), t, mesh, o_v=o_v)
            assert int(removed) == t, o_v
            assert not bool(overflow)
            st = _stats(out)
            fwd = set(zip(st["s"].tolist(), st["r"].tolist()))
            assert all((b, a) in fwd for a, b in fwd), o_v
            assert (st["w"] > 0).all(), o_v


class TestRoutingOverflow:
    def test_skewed_graph_overflow_and_escalation(self, mesh):
        """Drive the routing-overflow branch (VERDICT r3 weak #5): a star
        graph routes every spoke-elimination emission into the hub
        owner's shard, so a small `slack` must trip over_route/over_cap
        and flag it honestly; escalation (doubled slack) must then
        recover with removed == t and a sane Schur complement."""
        n = 512
        hub = 0
        spokes = np.arange(1, n)
        s = np.concatenate([np.full(n - 1, hub), spokes])
        r = np.concatenate([spokes, np.full(n - 1, hub)])
        g = G.Graph.from_edges(s, r, num_nodes=n)
        gp = partition_edges_by_sender(g, N_DEV)
        t = n // 2

        out1, removed1, overflow1 = eliminate_sharded(
            gp, jax.random.PRNGKey(3), t, mesh, slack=1)
        assert bool(overflow1), "skewed star must overflow at slack=1"

        out2, removed2, overflow2 = eliminate_sharded(
            gp, jax.random.PRNGKey(3), t, mesh, slack=1,
            max_escalations=3)
        assert not bool(overflow2)
        assert int(removed2) == t
        st = _stats(out2)
        assert (st["w"] > 0).all()
        fwd = set(zip(st["s"].tolist(), st["r"].tolist()))
        assert all((b, a) in fwd for a, b in fwd)


class TestUnpackedKeys:
    def test_large_n_beyond_packing_bound(self, mesh):
        """n above the int32 (owner, other) packing bound (46341) rides
        the two-key sort + 3-lane all_to_all path — the ogbn-arxiv-scale
        configuration. Invariants: exact removal count, no overflow,
        symmetric positive output, eliminated nodes absent, and total
        output weight within a loose band of the single-chip kernel's
        (both sample the same Schur-complement distribution)."""
        n, t = 50000, 25000
        g = barabasi_albert(n, 4, seed=5)
        gp = partition_edges_by_sender(g, N_DEV)
        out, removed, overflow = eliminate_sharded(
            gp, jax.random.PRNGKey(7), t, mesh)
        assert int(removed) == t
        assert not bool(overflow)
        gg = G.drop_zero_weight(G.coalesce(out))
        m = np.asarray(gg.edge_mask)
        s = np.asarray(gg.senders)[m]
        r = np.asarray(gg.receivers)[m]
        w = np.asarray(gg.weights)[m]
        assert (w > 0).all()
        fwd = set(zip(s.tolist(), r.tolist()))
        assert all((b, a) in fwd for a, b in fwd)

        ref, removed1, _ = eliminate(g, jax.random.PRNGKey(8), t)
        assert int(removed1) == t
        mr = np.asarray(ref.edge_mask)
        wref = np.asarray(ref.weights)[mr].sum()
        assert abs(w.sum() - wref) / wref < 0.1, (w.sum(), wref)
