"""GRACE: local-to-local (L2L) graph contrastive learning.

Reference recipe `scripts/node_shared.py`: a shared GCN encoder + projection
head over two augmented views, dual-branch InfoNCE (row-blocked variant,
batch 1024, `node_shared.py:54-85`), Adam, <=2000 epochs with early-stop
tolerance 50 on train loss, then a linear probe on the clean-graph
embeddings with a 0.1/0.8 split.

TPU design: augmentation runs as its own jitted device programs (the
reference round-trips GPU->CPU->GPU per epoch, `augmentor_benchmarks.py:
88-90`; here the views never leave the chip), and encoder+loss+optimizer is
one fused jit step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from rlap_tpu.core.graph import Graph
from rlap_tpu.models.common import torch_adam
from rlap_tpu.nn.gcn import GCNEncoder, ProjectionHead
from rlap_tpu.objectives.contrast import DualBranchContrast


class GRACE(nn.Module):
    hidden_dim: int = 128
    num_layers: int = 2
    proj_dim: int = 128
    mesh: Optional[object] = None

    def setup(self):
        self.encoder = GCNEncoder(self.hidden_dim, self.num_layers,
                                  mesh=self.mesh)
        self.project = ProjectionHead(self.proj_dim, self.hidden_dim)

    def __call__(self, g1: Graph, g2: Graph):
        z1 = self.encoder(g1, g1.x)
        z2 = self.encoder(g2, g2.x)
        return self.project(z1), self.project(z2)

    def embed(self, g: Graph):
        return self.encoder(g, g.x)


class GraceTrainer:
    def __init__(self, aug1=None, aug2=None, hidden_dim: int = 128,
                 num_layers: int = 2, lr: float = 1e-3,
                 weight_decay: float = 1e-5, tau: float = 0.2,
                 block_size: int = 1024, seed: int = 0,
                 loss: str = "auto", mesh=None, pair_augmentor=None):
        """`pair_augmentor`: optional `(g, key) -> (g1, g2)` producing both
        views in one call (e.g. `augment.rlap.PairedRLap`, which shares
        the elimination entry across views); overrides aug1/aug2."""
        if loss == "auto":
            # the fused Pallas InfoNCE keeps every similarity tile in VMEM;
            # on other backends fall back to the lax.map row-blocked form
            loss = ("infonce_fused" if jax.default_backend() == "tpu"
                    else "infonce_batched")
        self.aug1, self.aug2 = aug1, aug2
        self.pair_augmentor = pair_augmentor
        if pair_augmentor is None and (aug1 is None or aug2 is None):
            raise ValueError("pass aug1+aug2 or pair_augmentor")
        self.model = GRACE(hidden_dim, num_layers, hidden_dim, mesh=mesh)
        self.mesh = mesh
        self.tx = torch_adam(lr, weight_decay)
        self.contrast = DualBranchContrast(loss=loss, mode="L2L",
                                           tau=tau, block_size=block_size)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self._step = self._build_step()

    def _build_step(self):
        def step(params, opt_state, g1, g2):
            def loss_fn(p):
                h1, h2 = self.model.apply({"params": p}, g1, g2)
                return self.contrast(h1=h1, h2=h2, node_mask=g1.node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def _views(self, g: Graph):
        if self.pair_augmentor is not None:
            self.key, k = jax.random.split(self.key)
            return self.pair_augmentor(g, k)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        return self.aug1(g, k1), self.aug2(g, k2)

    def train_epoch(self, g: Graph) -> float:
        g1, g2 = self._views(g)
        if self.params is None:
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, g1, g2)["params"]
            self.opt_state = self.tx.init(self.params)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, g1, g2)
        return float(loss)

    def _ensure_init(self, g: Graph):
        """Initialize params/opt_state without running a train step (the
        RNG consumption mirrors train_epoch's first-call path)."""
        if self.params is None:
            g1, g2 = self._views(g)
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, g1, g2)["params"]
            self.opt_state = self.tx.init(self.params)

    def fit(self, g: Graph, max_epochs: int = 2000, tolerance: int = 50,
            verbose: bool = False, checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 100) -> list:
        """Train with early stopping (`node_shared.py:510-528`). With
        `checkpoint_dir`, saves (params, opt_state, RNG key, early-stop
        state) every `checkpoint_every` epochs and at stop, and RESUMES
        from the latest checkpoint if one exists — a killed 2000-epoch
        run restarts where it left off (new capability; the reference
        keeps no weights, SURVEY.md §5)."""
        from rlap_tpu.models.common import checkpointed_fit

        return checkpointed_fit(self, g, max_epochs, tolerance,
                                verbose=verbose,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every)

    def embed(self, g: Graph) -> jax.Array:
        return self.model.apply({"params": self.params}, g,
                                method=GRACE.embed)

    def evaluate(self, g: Graph, labels, train_ratio: float = 0.1,
                 test_ratio: float = 0.8, seed: int = 0) -> dict:
        from rlap_tpu.eval import get_split, lr_evaluate

        z = self.embed(g)
        split = get_split(g.num_nodes, train_ratio, test_ratio, seed=seed)
        num_classes = int(jnp.max(jnp.asarray(labels))) + 1
        return lr_evaluate(z, labels, split, num_classes=num_classes)
