"""Encoder and objective tests: GCN parity vs dense reference math,
GIN pooling, InfoNCE blocked-vs-full equivalence, JSD/bootstrap/CCA shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import barabasi_albert, synthetic_node_dataset
from rlap_tpu.nn import GCNConv, GCNEncoder, GINEncoder
from rlap_tpu.objectives import (DualBranchContrast, cca_ssg_loss, infonce,
                                 infonce_batched, jsd, same_scale_masks)


def _dense_gcn_reference(a, x, w, b):
    """Dense GCNConv: A_hat = D^-1/2 (A + I) D^-1/2 ; out = A_hat x w + b."""
    n = a.shape[0]
    a = a + np.eye(n)
    d = a.sum(1)
    dinv = 1 / np.sqrt(d)
    ahat = a * dinv[:, None] * dinv[None, :]
    return ahat @ (x @ w) + b


def test_gcnconv_matches_dense():
    g = barabasi_albert(40, 3, seed=2)
    x = np.random.default_rng(0).normal(size=(40, 16)).astype(np.float32)
    conv = GCNConv(8)
    params = conv.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = conv.apply(params, g, jnp.asarray(x))
    w = np.asarray(params["params"]["lin"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    ref = _dense_gcn_reference(np.asarray(G.to_dense(g)), x, w, b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gcn_encoder_shapes():
    g, _ = synthetic_node_dataset(n=64, feature_dim=8)
    enc = GCNEncoder(hidden_dim=32, num_layers=3)
    params = enc.init(jax.random.PRNGKey(0), g, g.x)
    z = enc.apply(params, g, g.x)
    assert z.shape == (64, 32)
    assert np.isfinite(np.asarray(z)).all()


def test_gin_encoder_batched():
    from rlap_tpu.data.synthetic import synthetic_graph_dataset

    graphs, labels = synthetic_graph_dataset(num_graphs=8)
    batch, seg = G.block_diagonal(graphs, node_capacity=256,
                                  edge_capacity=2048)
    enc = GINEncoder(hidden_dim=16, num_layers=2)
    variables = enc.init(jax.random.PRNGKey(0), batch, batch.x, seg, 8)
    (z, gemb), _ = enc.apply(variables, batch, batch.x, seg, 8,
                             mutable=["batch_stats"])
    assert z.shape == (256, 32)
    assert gemb.shape == (8, 32)
    assert np.isfinite(np.asarray(gemb)).all()


def test_infonce_blocked_matches_full():
    rng = np.random.default_rng(1)
    h1 = jnp.asarray(rng.normal(size=(100, 16)), jnp.float32)
    h2 = jnp.asarray(rng.normal(size=(100, 16)), jnp.float32)
    pos, neg = same_scale_masks(100)
    full = infonce(h1, h2, pos, neg, tau=0.2)
    blocked = infonce_batched(h1, h2, tau=0.2, block_size=32)
    np.testing.assert_allclose(float(full), float(blocked), rtol=1e-5)


def test_dual_branch_l2l_runs():
    rng = np.random.default_rng(2)
    h1 = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    h2 = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    c = DualBranchContrast(loss="infonce", mode="L2L", tau=0.2)
    l = c(h1=h1, h2=h2)
    assert np.isfinite(float(l))
    cb = DualBranchContrast(loss="infonce_batched", mode="L2L", tau=0.2,
                            block_size=16)
    np.testing.assert_allclose(float(cb(h1=h1, h2=h2)), float(l), rtol=1e-5)


def test_jsd_and_bootstrap():
    rng = np.random.default_rng(3)
    g1 = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(30, 8)), jnp.float32)
    hn = jnp.asarray(rng.normal(size=(30, 8)), jnp.float32)
    c = DualBranchContrast(loss="jsd", mode="G2L")
    l = c(h1=h, h2=h, g1=g1, g2=g1, h3=hn, h4=hn)
    assert np.isfinite(float(l))


def test_cca_loss_identity_minimum():
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(200, 16)), jnp.float32)
    l_same = cca_ssg_loss(z, z, lam=1e-3)
    l_diff = cca_ssg_loss(
        z, jnp.asarray(rng.normal(size=(200, 16)), jnp.float32), lam=1e-3)
    assert float(l_same) < float(l_diff)


def test_augmentors_smoke():
    from rlap_tpu.augment import make_augmentor_pair, AUGMENTOR_NAMES

    g, _ = synthetic_node_dataset(n=64, feature_dim=8)
    key = jax.random.PRNGKey(0)
    for name in AUGMENTOR_NAMES:
        a1, a2 = make_augmentor_pair(name, 0.2, 0.3, num_nodes=64)
        out1 = a1(g, key)
        out2 = a2(g, jax.random.fold_in(key, 1))
        for out in (out1, out2):
            assert out.num_nodes == 64
            assert np.isfinite(np.asarray(out.weights)).all()
            m = np.asarray(out.edge_mask)
            assert np.all(np.asarray(out.weights)[~m] == 0)
        # feature masking zeroed some dims
        assert np.asarray(out1.x).shape == (64, 8)
