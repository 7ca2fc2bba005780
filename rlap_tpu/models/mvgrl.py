"""MVGRL: global-to-local (G2L) contrast with two dedicated encoders.

Reference `scripts/node_dedicated.py`: per-view GCN encoders (PReLU
per-channel, `node_dedicated.py:137-153`), global summaries
g = Linear(sigmoid(mean(z))) (`:193-194`), DGI-style corruption by
row-shuffling features (`:166-168`), JSD G2L loss (`:36-53`), diffusion
views subsampled to 8192 nodes (`:175-189` — realized here as a node *mask*
so shapes stay static), test embedding z1 + z2 (`:210-216`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.models.common import torch_adam
from rlap_tpu.nn.gcn import GCNConv
from rlap_tpu.objectives.contrast import DualBranchContrast


class ChannelPReLU(nn.Module):
    """nn.PReLU(hidden_dim): one slope per channel (node_dedicated.py:141)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", nn.initializers.constant(0.25),
                       (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class DedicatedGCN(nn.Module):
    hidden_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        act = ChannelPReLU(name="act")  # shared across layers, like torch
        for i in range(self.num_layers):
            x = GCNConv(self.hidden_dim, name=f"conv_{i}")(g, x)
            x = act(x)
        return x


class MVGRL(nn.Module):
    hidden_dim: int = 128
    num_layers: int = 2

    def setup(self):
        self.encoder1 = DedicatedGCN(self.hidden_dim, self.num_layers)
        self.encoder2 = DedicatedGCN(self.hidden_dim, self.num_layers)
        self.project = nn.Dense(self.hidden_dim)

    def _summary(self, z, node_mask):
        if node_mask is None:
            m = jnp.mean(z, axis=0, keepdims=True)
        else:
            w = node_mask.astype(z.dtype)[:, None]
            m = jnp.sum(z * w, axis=0, keepdims=True) / jnp.maximum(
                jnp.sum(w), 1.0)
        return self.project(jax.nn.sigmoid(m))

    def __call__(self, g1: Graph, g2: Graph, key: jax.Array):
        z1 = self.encoder1(g1, g1.x)
        z2 = self.encoder2(g2, g2.x)
        gl1 = self._summary(z1, g1.node_mask)
        gl2 = self._summary(z2, g2.node_mask)
        # corruption: row-shuffled features through the same encoders
        k1, k2 = jax.random.split(key)
        x1n = g1.x[jax.random.permutation(k1, g1.x.shape[0])]
        x2n = g2.x[jax.random.permutation(k2, g2.x.shape[0])]
        z1n = self.encoder1(g1, x1n)
        z2n = self.encoder2(g2, x2n)
        return z1, z2, gl1, gl2, z1n, z2n

    def embed(self, g1: Graph, g2: Graph):
        return self.encoder1(g1, g1.x) + self.encoder2(g2, g2.x)


class MVGRLTrainer:
    def __init__(self, aug1, aug2, augmentor_name: str = "rLap",
                 hidden_dim: int = 128, num_layers: int = 2,
                 lr: float = 1e-3, weight_decay: float = 1e-5,
                 subsample: int = 8192, seed: int = 0):
        self.aug1, self.aug2 = aug1, aug2
        self.augmentor_name = augmentor_name
        self.subsample = subsample
        self.model = MVGRL(hidden_dim, num_layers)
        self.tx = torch_adam(lr, weight_decay)
        self.contrast = DualBranchContrast(loss="jsd", mode="G2L")
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self._step = self._build_step()

    def _build_step(self):
        def step(params, opt_state, g1, g2, key):
            def loss_fn(p):
                z1, z2, gl1, gl2, z1n, z2n = self.model.apply(
                    {"params": p}, g1, g2, key)
                return self.contrast(h1=z1, h2=z2, g1=gl1, g2=gl2,
                                     h3=z1n, h4=z2n,
                                     node_mask=g1.node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def _views(self, g: Graph, keys=None):
        """Augmented view pair. With `keys=None` draws from (and advances)
        the trainer's RNG stream — the training path; eval passes a pinned
        key triple so repeated `embed` calls see the SAME views and eval
        repeats measure split variance only, not augmentation noise."""
        if keys is None:
            self.key, k1, k2, k3 = jax.random.split(self.key, 4)
        else:
            k1, k2, k3 = keys
        g1 = self.aug1(g, k1)
        g2 = self.aug2(g, k2)
        if ("diffusion" in self.augmentor_name.lower()
                and g.num_nodes > self.subsample):
            # subsample both views to the same random <=8192-node subset
            # (node_dedicated.py:175-189); a mask, not a relabel.
            g2c = G.remove_self_loops(g2)
            deg2 = G.degrees(g2c)
            scores = jnp.where(deg2 > 0,
                               jax.random.uniform(k3, (g.num_nodes,)), -1.0)
            thresh = jnp.sort(scores)[-self.subsample]
            keep = scores >= jnp.maximum(thresh, 0.0)
            g1 = G.induced_subgraph(g1, keep)
            g2 = G.induced_subgraph(g2, keep)
            nm = keep if g.node_mask is None else (keep & g.node_mask)
            g1 = g1.replace(node_mask=nm)
            g2 = g2.replace(node_mask=nm)
        return g1, g2

    def train_epoch(self, g: Graph) -> float:
        g1, g2 = self._views(g)
        self.key, kc = jax.random.split(self.key)
        if self.params is None:
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, g1, g2, kc)["params"]
            self.opt_state = self.tx.init(self.params)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, g1, g2, kc)
        return float(loss)

    def _ensure_init(self, g: Graph):
        """Initialize params/opt_state without a train step (RNG use
        mirrors train_epoch's first-call path)."""
        if self.params is None:
            g1, g2 = self._views(g)
            self.key, kc = jax.random.split(self.key)
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, g1, g2, kc)["params"]
            self.opt_state = self.tx.init(self.params)

    def fit(self, g: Graph, max_epochs: int = 2000, tolerance: int = 50,
            verbose: bool = False, checkpoint_dir=None,
            checkpoint_every: int = 100) -> list:
        from rlap_tpu.models.common import checkpointed_fit

        return checkpointed_fit(self, g, max_epochs, tolerance,
                                verbose=verbose,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every)

    def embed(self, g: Graph, key=None) -> jax.Array:
        """Evaluation embedding z1+z2 on an augmented view pair
        (`node_dedicated.py:210-216`). The view keys are PINNED (derived
        from `key`, default a fixed constant) so repeated calls embed the
        same views — eval-repeat variance is split noise only."""
        if key is None:
            key = jax.random.PRNGKey(0x5EED)
        g1, g2 = self._views(g, keys=jax.random.split(key, 3))
        return self.model.apply({"params": self.params}, g1, g2,
                                method=MVGRL.embed)

    def evaluate(self, g: Graph, labels, seed: int = 0) -> dict:
        from rlap_tpu.eval import get_split, lr_evaluate

        z = self.embed(g)
        split = get_split(g.num_nodes, 0.1, 0.8, seed=seed)
        num_classes = int(jnp.max(jnp.asarray(labels))) + 1
        return lr_evaluate(z, labels, split, num_classes=num_classes)
