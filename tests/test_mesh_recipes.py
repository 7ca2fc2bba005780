"""Recipes with sharded encoders on the 8-device CPU mesh (VERDICT item 8):
GRACE with edge-partitioned GCN aggregation, GraphCL with its graph batch
sharded over devices, and the two-level (replica, data) mesh construction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlap_tpu.augment.feature import FeatureMasking
from rlap_tpu.core import graph as G
from rlap_tpu.data.synthetic import (barabasi_albert, synthetic_graph_dataset,
                                     synthetic_node_dataset)
from rlap_tpu.parallel.mesh import make_mesh_2level


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:N_DEV]), ("data",))


class TestShardedGrace:
    def test_train_and_parity(self, mesh):
        from rlap_tpu.models.grace import GraceTrainer

        # n and e_cap + n divisible by the axis (gcn_norm appends loops)
        g, y = synthetic_node_dataset(n=256, feature_dim=64,
                                      edge_capacity=4096, seed=0)
        aug = FeatureMasking(pf=0.3)
        kwargs = dict(hidden_dim=32, num_layers=2, lr=1e-3, seed=0)
        tr_mesh = GraceTrainer(aug, aug, mesh=mesh, **kwargs)
        tr_local = GraceTrainer(aug, aug, **kwargs)

        # same seeds -> the sharded encoder must match the local one
        l_mesh = [tr_mesh.train_epoch(g) for _ in range(3)]
        l_local = [tr_local.train_epoch(g) for _ in range(3)]
        assert np.all(np.isfinite(l_mesh))
        np.testing.assert_allclose(l_mesh, l_local, rtol=1e-4, atol=1e-5)

    def test_sharded_inputs(self, mesh):
        """Sharded edge arrays + mesh encoder end to end."""
        from rlap_tpu.models.grace import GraceTrainer
        from rlap_tpu.parallel.mesh import shard_graph

        g, _ = synthetic_node_dataset(n=256, feature_dim=64,
                                      edge_capacity=4096, seed=1)
        gs = shard_graph(g, mesh)
        aug = FeatureMasking(pf=0.3)
        tr = GraceTrainer(aug, aug, hidden_dim=32, mesh=mesh)
        loss = tr.train_epoch(gs)
        assert np.isfinite(loss)


class TestShardedGraphCL:
    def test_train(self, mesh):
        from rlap_tpu.models.graphcl import GraphCLTrainer

        graphs, y = synthetic_graph_dataset(num_graphs=24, seed=3)
        aug = FeatureMasking(pf=0.3)
        tr = GraphCLTrainer(aug, aug, hidden_dim=16, num_layers=2,
                            batch_size=8, mesh=mesh, seed=0)
        losses = tr.fit(graphs, max_epochs=2)
        assert np.all(np.isfinite(losses))
        res = tr.evaluate(graphs, y)
        assert 0.0 <= res["accuracy"] <= 1.0


class TestTwoLevelMesh:
    def test_2x4(self):
        mesh = make_mesh_2level(replica=2, data=4)
        assert mesh.shape == {"replica": 2, "data": 4}

    def test_spmm_on_2level(self):
        """Edge-partitioned SpMM over the inner "data" axis of a 2-level
        mesh, parameters replicated over "replica"."""
        from rlap_tpu.ops.spmm import spmm

        mesh = make_mesh_2level(replica=2, data=4)
        g = barabasi_albert(128, 4, seed=0, edge_capacity=2048)
        x = jnp.ones((128, 32), jnp.float32)
        ref = spmm(g, x)
        edge = NamedSharding(mesh, P("data"))
        gs = g.replace(senders=jax.device_put(g.senders, edge),
                       receivers=jax.device_put(g.receivers, edge),
                       weights=jax.device_put(g.weights, edge))
        out = spmm(gs, jax.device_put(x, NamedSharding(mesh, P())),
                   mesh=mesh, axis="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestTensorParallel:
    def test_tp_sharded_params_match(self):
        """GRACE forward with hidden dims sharded over a "model" axis
        matches the replicated forward (GSPMD partitions the matmuls)."""
        from rlap_tpu.models.grace import GRACE
        from rlap_tpu.parallel.mesh import make_mesh_2level
        from rlap_tpu.parallel.tp import shard_params_tp

        mesh = make_mesh_2level(replica=2, data=4,
                                axis_names=("replica", "model"))
        g, _ = synthetic_node_dataset(n=128, feature_dim=32,
                                      edge_capacity=2048, seed=2)
        model = GRACE(hidden_dim=64, num_layers=2, proj_dim=64)
        params = model.init(jax.random.PRNGKey(0), g, g)["params"]
        ref1, ref2 = model.apply({"params": params}, g, g)

        tp_params = shard_params_tp(params, mesh, axis="model")
        # every 2D kernel must actually be sharded over its output dim
        flat = jax.tree_util.tree_leaves_with_path(tp_params)
        kernels = [l for p, l in flat
                   if any(getattr(k, "key", "") == "kernel" for k in p)]
        assert kernels
        assert all(not l.sharding.is_fully_replicated for l in kernels
                   if l.ndim == 2 and l.shape[1] % 4 == 0)

        with mesh:
            out1, out2 = jax.jit(
                lambda p, a, b: model.apply({"params": p}, a, b)
            )(tp_params, g, g)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   rtol=2e-4, atol=2e-5)
