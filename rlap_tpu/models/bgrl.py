"""BGRL (g2l): bootstrapped, negative-free graph contrast.

Reference `scripts/graph_shared_g2l.py`: online GIN encoder with projection
head (Linear -> BatchNorm -> PReLU -> Dropout, `:157-162`), a predictor of
the same shape (`:182-187`), a target encoder = EMA(momentum 0.99) copy of
the online one with stopped gradients (`:189-202,252`), and PyGCL
`BootstrapContrast(BootstrapLatent(), G2L)`: node-anchored cosine alignment
of h_pred against the *other* view's target graph summary (`:243-249`);
eval embeds = concat[g1, g2] (`:270-271`).

TPU design: target params are just a second pytree; EMA is one fused
`tree_map` inside the jitted step — no parameter copying machinery.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.models.common import torch_adam
from rlap_tpu.nn.gin import GINConv
from rlap_tpu.nn.layers import MaskedBatchNorm, PReLU, global_add_pool
from rlap_tpu.objectives.contrast import (bootstrap_latent,
                                          cross_scale_masks_batched)


class _Head(nn.Module):
    """Linear -> BatchNorm -> PReLU (dropout handled by caller rngs)."""

    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        x = nn.Dense(self.hidden_dim)(x)
        x = MaskedBatchNorm()(x, mask=mask, use_running_average=not train)
        x = PReLU()(x)
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class BGRLEncoder(nn.Module):
    """GIN conv stack -> BatchNorm -> (z, projection(z))
    (`graph_shared_g2l.py:137-171`)."""

    hidden_dim: int = 32
    num_layers: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, g: Graph, x, train: bool = True):
        act = PReLU(name="act")
        for i in range(self.num_layers):
            x = GINConv(self.hidden_dim, name=f"conv_{i}")(g, x)
            x = act(x)
            if train and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        z = MaskedBatchNorm(name="bn")(x, mask=g.node_mask,
                                       use_running_average=not train)
        h = _Head(self.hidden_dim, self.dropout,
                  name="projection")(z, mask=g.node_mask, train=train)
        return z, h


class BGRL(nn.Module):
    hidden_dim: int = 32
    num_layers: int = 2
    dropout: float = 0.2

    def setup(self):
        self.encoder = BGRLEncoder(self.hidden_dim, self.num_layers,
                                   self.dropout)
        self.predictor = _Head(self.hidden_dim, self.dropout)

    def online(self, g: Graph, seg, num_graphs: int, train: bool = True):
        z, h = self.encoder(g, g.x, train=train)
        gemb = global_add_pool(
            jnp.where((g.node_mask if g.node_mask is not None
                       else jnp.ones(z.shape[0], bool))[:, None], z, 0.0),
            seg, num_graphs)
        hp = self.predictor(h, mask=g.node_mask, train=train)
        return z, gemb, hp

    def target(self, g: Graph, seg, num_graphs: int):
        z, h = self.encoder(g, g.x, train=False)
        h = jnp.where((g.node_mask if g.node_mask is not None
                       else jnp.ones(z.shape[0], bool))[:, None], h, 0.0)
        g_t = global_add_pool(h, seg, num_graphs)
        return g_t


class BGRLTrainer:
    def __init__(self, aug1, aug2, hidden_dim: int = 32, num_layers: int = 2,
                 lr: float = 1e-2, weight_decay: float = 0.0,
                 momentum: float = 0.99, batch_size: int = 128,
                 seed: int = 0):
        self.aug1, self.aug2 = aug1, aug2
        self.model = BGRL(hidden_dim, num_layers)
        self.tx = torch_adam(lr, weight_decay)
        self.momentum = momentum
        self.batch_size = batch_size
        self.key = jax.random.PRNGKey(seed)
        self.params = None  # online
        self.target_params = None
        self.batch_stats = None
        self.opt_state = None
        self._step = self._build_step()

    def _build_step(self):
        def step(params, target_params, batch_stats, opt_state,
                 g1, g2, seg, num_graphs, rng):
            pos1, _ = cross_scale_masks_batched(seg, num_graphs,
                                                node_mask=g1.node_mask)
            pos_nodes = pos1.T  # node-anchored [N, G]

            def loss_fn(p, bs):
                r1, r2 = jax.random.split(rng)
                (_, _, h1p), v1 = self.model.apply(
                    {"params": p, "batch_stats": bs}, g1, seg, num_graphs,
                    True, method=BGRL.online, mutable=["batch_stats"],
                    rngs={"dropout": r1})
                (_, _, h2p), v2 = self.model.apply(
                    {"params": p, "batch_stats": v1["batch_stats"]},
                    g2, seg, num_graphs, True, method=BGRL.online,
                    mutable=["batch_stats"], rngs={"dropout": r2})
                g1t = self.model.apply(
                    {"params": target_params, "batch_stats": bs},
                    g1, seg, num_graphs, method=BGRL.target)
                g2t = self.model.apply(
                    {"params": target_params, "batch_stats": bs},
                    g2, seg, num_graphs, method=BGRL.target)
                l1 = bootstrap_latent(h1p, jax.lax.stop_gradient(g2t),
                                      pos_nodes)
                l2 = bootstrap_latent(h2p, jax.lax.stop_gradient(g1t),
                                      pos_nodes)
                return 0.5 * (l1 + l2), v2["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # EMA: target <- m * target + (1-m) * online  (:197-202)
            target_params = jax.tree.map(
                lambda t, o: self.momentum * t + (1 - self.momentum) * o,
                target_params, params)
            return params, target_params, bs, opt_state, loss

        return jax.jit(step, static_argnames=("num_graphs",))

    def _init(self, g, seg, ng):
        self.key, k, kd = jax.random.split(self.key, 3)
        variables = self.model.init({"params": k, "dropout": kd}, g, seg, ng,
                                    True, method=BGRL.online)
        self.params = variables["params"]
        self.target_params = jax.tree.map(jnp.copy, self.params)
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

    _ckpt_extra = ("target_params", "batch_stats")  # ride in checkpoints

    def train_epoch(self, graphs: Sequence[Graph], epoch: int = 0) -> float:
        from rlap_tpu.models.common import make_union_batches

        batches = make_union_batches(graphs, self.batch_size,
                                     shuffle_seed=epoch)
        total = 0.0
        for batch, seg, ng in batches:
            self.key, k1, k2, kr = jax.random.split(self.key, 4)
            g1 = self.aug1(batch, k1)
            g2 = self.aug2(batch, k2)
            if self.params is None:
                self._init(g1, seg, ng)
            (self.params, self.target_params, self.batch_stats,
             self.opt_state, loss) = self._step(
                self.params, self.target_params, self.batch_stats,
                self.opt_state, g1, g2, seg, ng, kr)
            total += float(loss)
        return total

    def _ensure_init(self, graphs: Sequence[Graph]):
        """Build the params/target/batch_stats pytree structure without
        training (restored checkpoints overwrite the values)."""
        from rlap_tpu.models.common import make_union_batches

        if self.params is None:
            batch, seg, ng = make_union_batches(
                graphs, self.batch_size, shuffle_seed=0)[0]
            self.key, k1, k2, kr = jax.random.split(self.key, 4)
            self._init(self.aug1(batch, k1), seg, ng)

    def fit(self, graphs: Sequence[Graph], max_epochs: int = 100,
            tolerance: int = 20, verbose: bool = False,
            checkpoint_dir=None, checkpoint_every: int = 100) -> list:
        from rlap_tpu.models.common import checkpointed_fit

        return checkpointed_fit(self, graphs, max_epochs, tolerance,
                                verbose=verbose,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every)

    def embed_graphs(self, graphs: Sequence[Graph]) -> np.ndarray:
        """Eval embeds = concat[g1, g2] of the two *clean* views
        (graph_shared_g2l.py:270-271 with identity augmentation here)."""
        outs = []
        for start in range(0, len(graphs), self.batch_size):
            chunk = list(graphs[start:start + self.batch_size])
            ncap = ((sum(g.num_nodes for g in chunk) + 127) // 128) * 128
            ecap = ((sum(int(g.num_edges) for g in chunk) + 255) // 256) * 256
            batch, seg = G.block_diagonal(chunk, node_capacity=ncap,
                                          edge_capacity=ecap)
            _, gemb, _ = self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats},
                batch, seg, len(chunk), False, method=BGRL.online,
                rngs={"dropout": jax.random.PRNGKey(0)})
            outs.append(np.asarray(gemb)[:len(chunk)])
        x = np.concatenate(outs, axis=0)
        return np.concatenate([x, x], axis=1)

    def evaluate(self, graphs: Sequence[Graph], labels, seed: int = 0) -> dict:
        from rlap_tpu.eval import get_split, lr_evaluate

        x = self.embed_graphs(graphs)
        split = get_split(len(graphs), 0.8, 0.1, seed=seed)
        num_classes = int(np.max(labels)) + 1
        return lr_evaluate(x, labels, split, num_classes=num_classes)
