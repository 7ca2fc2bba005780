"""GraphCL: graph-to-graph (G2G) contrast on batched graph datasets.

Reference `scripts/graph_shared.py`: GIN encoder (2-layer-MLP convs, ReLU,
BatchNorm, concat readout of per-layer sum-pools, `graph_shared.py:100-130`),
per-batch augmentation of the whole 128-graph block-diagonal union
(`:141-146` — rLap sees ONE disjoint-union graph), projection head, PyGCL
DualBranchContrast(InfoNCE(tau=0.2), G2G) (`:297`), featureless fallback
x = ones (`:156-160`), eval on concat[g1, g2]? — no: graph_shared uses g
embedding from the clean pass; linear probe split 0.8/0.1 (`:188`).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.models.common import torch_adam
from rlap_tpu.nn.gin import GINEncoder
from rlap_tpu.nn.layers import MLP
from rlap_tpu.objectives.contrast import DualBranchContrast


class GraphCL(nn.Module):
    hidden_dim: int = 32
    num_layers: int = 2
    mesh: object = None

    def setup(self):
        self.encoder = GINEncoder(self.hidden_dim, self.num_layers,
                                  mesh=self.mesh)
        d = self.hidden_dim * self.num_layers
        self.project = MLP([d, d], activate_final=False)

    def __call__(self, g: Graph, seg: jax.Array, num_graphs: int,
                 train: bool = True):
        z, gemb = self.encoder(g, g.x, seg, num_graphs, train=train)
        return z, gemb, self.project(gemb)


class GraphCLTrainer:
    def __init__(self, aug1, aug2, hidden_dim: int = 32,
                 num_layers: int = 2, lr: float = 1e-2,
                 weight_decay: float = 0.0, tau: float = 0.2,
                 batch_size: int = 128, seed: int = 0, mesh=None):
        """`mesh`: shard each block-diagonal batch's edges over the mesh's
        "data" axis (the DP/graph-batch row of SURVEY.md §2.3); the GIN
        aggregation then runs as the shard_map edge-partitioned SpMM."""
        self.aug1, self.aug2 = aug1, aug2
        self.mesh = mesh
        self.model = GraphCL(hidden_dim, num_layers, mesh=mesh)
        self.tx = torch_adam(lr, weight_decay)
        self.contrast = DualBranchContrast(loss="infonce", mode="G2G",
                                           tau=tau)
        self.batch_size = batch_size
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self._step = self._build_step()

    # ---- batching -------------------------------------------------------

    def make_batches(self, graphs: Sequence[Graph], shuffle_seed: int = 0):
        """Host-side: pad graphs into fixed-capacity block-diagonal unions so
        every batch compiles to the same program."""
        from rlap_tpu.models.common import make_union_batches

        return make_union_batches(graphs, self.batch_size,
                                  shuffle_seed=shuffle_seed)

    def _build_step(self):
        def step(params, batch_stats, opt_state, g1, g2, seg, num_graphs):
            def loss_fn(p, bs):
                (z1, ge1, h1), var1 = self.model.apply(
                    {"params": p, "batch_stats": bs}, g1, seg, num_graphs,
                    True, mutable=["batch_stats"])
                (z2, ge2, h2), var2 = self.model.apply(
                    {"params": p, "batch_stats": var1["batch_stats"]},
                    g2, seg, num_graphs, True, mutable=["batch_stats"])
                loss = self.contrast(g1=h1, g2=h2)
                return loss, var2["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), bs, opt_state, loss

        return jax.jit(step, static_argnames=("num_graphs",))

    def _shard_batch(self, g: Graph) -> Graph:
        if self.mesh is None:
            return g
        from jax.sharding import NamedSharding, PartitionSpec as P

        edge = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        return g.replace(
            senders=jax.device_put(g.senders, edge),
            receivers=jax.device_put(g.receivers, edge),
            weights=jax.device_put(g.weights, edge),
            x=None if g.x is None else jax.device_put(g.x, repl),
            node_mask=None if g.node_mask is None else jax.device_put(
                g.node_mask, repl))

    _ckpt_extra = ("batch_stats",)  # rides in checkpoints (common.py)

    def train_epoch(self, graphs: Sequence[Graph], epoch: int = 0) -> float:
        batches = self.make_batches(graphs, shuffle_seed=epoch)
        total = 0.0
        for batch, seg, ng in batches:
            self.key, k1, k2 = jax.random.split(self.key, 3)
            g1 = self._shard_batch(self.aug1(batch, k1))
            g2 = self._shard_batch(self.aug2(batch, k2))
            if self.params is None:
                self.key, k = jax.random.split(self.key)
                variables = self.model.init(k, g1, seg, ng)
                self.params = variables["params"]
                self.batch_stats = variables.get("batch_stats", {})
                self.opt_state = self.tx.init(self.params)
            self.params, self.batch_stats, self.opt_state, loss = self._step(
                self.params, self.batch_stats, self.opt_state,
                g1, g2, seg, ng)
            total += float(loss)
        return total

    def _ensure_init(self, graphs: Sequence[Graph]):
        """Build the params/opt_state/batch_stats pytree structure without
        training (restored checkpoints overwrite the values)."""
        if self.params is None:
            batch, seg, ng = self.make_batches(graphs, shuffle_seed=0)[0]
            self.key, k1, k2 = jax.random.split(self.key, 3)
            g1 = self._shard_batch(self.aug1(batch, k1))
            self.key, k = jax.random.split(self.key)
            variables = self.model.init(k, g1, seg, ng)
            self.params = variables["params"]
            self.batch_stats = variables.get("batch_stats", {})
            self.opt_state = self.tx.init(self.params)

    def fit(self, graphs: Sequence[Graph], max_epochs: int = 100,
            tolerance: int = 20, verbose: bool = False,
            checkpoint_dir=None, checkpoint_every: int = 100) -> list:
        from rlap_tpu.models.common import checkpointed_fit

        return checkpointed_fit(self, graphs, max_epochs, tolerance,
                                verbose=verbose,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every)

    def embed_graphs(self, graphs: Sequence[Graph]) -> np.ndarray:
        """Clean-pass graph embeddings in dataset order (no augmentation,
        running BatchNorm stats — the reference's model.eval() pass)."""
        outs = []
        for start in range(0, len(graphs), self.batch_size):
            chunk = list(graphs[start:start + self.batch_size])
            ncap = ((sum(g.num_nodes for g in chunk) + 127) // 128) * 128
            ecap = ((sum(int(g.num_edges) for g in chunk) + 255) // 256) * 256
            batch, seg = G.block_diagonal(chunk, node_capacity=ncap,
                                          edge_capacity=ecap)
            _, gemb, _ = self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats},
                batch, seg, len(chunk), False)
            outs.append(np.asarray(gemb)[:len(chunk)])
        return np.concatenate(outs, axis=0)

    def evaluate(self, graphs: Sequence[Graph], labels, seed: int = 0) -> dict:
        from rlap_tpu.eval import get_split, lr_evaluate

        x = self.embed_graphs(graphs)
        split = get_split(len(graphs), 0.8, 0.1, seed=seed)
        num_classes = int(np.max(labels)) + 1
        return lr_evaluate(x, labels, split, num_classes=num_classes)
