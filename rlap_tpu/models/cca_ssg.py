"""CCA-SSG: feature-decorrelation self-supervised learning.

Reference `CCA-SSG/{main,model}.py`: both views from the SAME augmentor
function (`main.py:96-98`), self-loops added post-augmentation
(`main.py:100-101`), GCN (norm='both') or MLP backbone (`model.py:38-67`),
per-dim standardized embeddings and
loss = -tr(z1ᵀz2)/N + lam(||I-z1ᵀz1/N||² + ||I-z2ᵀz2/N||²)
(`main.py:111-124`); linear eval with a LogReg probe selected by best val
accuracy (`main.py:152-194`).
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
from rlap_tpu.objectives.cca import cca_ssg_loss, standardize


class CCAGCN(nn.Module):
    """n_layers GraphConv with PReLU between (last layer linear), the
    reference GCN backbone (`model.py:38-56`)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, g: Graph, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = GCNConv(out, add_self_loops=False, name=f"conv_{i}")(g, x)
            if i < self.num_layers - 1:
                a = self.param(f"prelu_{i}", nn.initializers.constant(0.25),
                               ())
                x = jnp.where(x >= 0, x, a * x)
        return x


class CCAMLP(nn.Module):
    """MLP backbone option (`model.py:59-67`)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, g: Graph, x):
        from rlap_tpu.nn.layers import PReLU

        x = nn.Dense(self.hidden_dim)(x)
        x = PReLU(name="act")(x)
        return nn.Dense(self.out_dim)(x)


class CCASSG(nn.Module):
    hidden_dim: int = 512
    out_dim: int = 512
    num_layers: int = 2
    backbone: str = "gcn"

    def setup(self):
        if self.backbone == "gcn":
            self.net = CCAGCN(self.hidden_dim, self.out_dim, self.num_layers)
        else:
            self.net = CCAMLP(self.hidden_dim, self.out_dim)

    def __call__(self, g1: Graph, g2: Graph):
        z1 = self.net(g1, g1.x)
        z2 = self.net(g2, g2.x)
        return (standardize(z1, g1.node_mask),
                standardize(z2, g2.node_mask))

    def embed(self, g: Graph):
        return self.net(g, g.x)


class CCASSGTrainer:
    def __init__(self, aug, hidden_dim: int = 512, out_dim: int = 512,
                 num_layers: int = 2, lr: float = 1e-3,
                 weight_decay: float = 0.0, lam: float = 1e-3,
                 backbone: str = "gcn", seed: int = 0):
        self.aug = aug  # ONE augmentor, applied twice (main.py:96-98)
        self.model = CCASSG(hidden_dim, out_dim, num_layers, backbone)
        self.tx = torch_adam(lr, weight_decay)
        self.lam = lam
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self._step = self._build_step()

    def _build_step(self):
        def step(params, opt_state, g1, g2):
            def loss_fn(p):
                z1, z2 = self.model.apply({"params": p}, g1, g2)
                return cca_ssg_loss(z1, z2, lam=self.lam,
                                    node_mask=g1.node_mask,
                                    pre_standardized=True)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def _views(self, g: Graph):
        self.key, k1, k2 = jax.random.split(self.key, 3)
        g1 = self.aug(g, k1)
        g2 = self.aug(g, k2)
        # add_self_loop after augmentation (main.py:100-101)
        return G.add_self_loops(g1), G.add_self_loops(g2)

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
        if self.params is None:
            g1, g2 = self._views(g)
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, g1, g2)["params"]
            self.opt_state = self.tx.init(self.params)

    def fit(self, g: Graph, max_epochs: int = 100, verbose: bool = False,
            tolerance: int = 10**9, checkpoint_dir=None,
            checkpoint_every: int = 100) -> list:
        # the reference runs a fixed epoch budget per dataset (run.sh);
        # checkpoint/resume is shared trainer capability (common.py)
        from rlap_tpu.models.common import checkpointed_fit

        return checkpointed_fit(self, g, max_epochs, tolerance,
                                verbose=verbose,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_every=checkpoint_every,
                                log_every=10)

    def embed(self, g: Graph) -> jax.Array:
        # eval on the clean graph with self-loops (main.py:131-150)
        return self.model.apply({"params": self.params},
                                G.add_self_loops(g), method=CCASSG.embed)

    def evaluate(self, g: Graph, labels, train_ratio: float = 0.1,
                 test_ratio: float = 0.8, lr2: float = 1e-2,
                 wd2: float = 1e-4, seed: int = 0) -> dict:
        from rlap_tpu.eval import get_split, lr_evaluate

        z = self.embed(g)
        split = get_split(g.num_nodes, train_ratio, test_ratio, seed=seed)
        num_classes = int(jnp.max(jnp.asarray(labels))) + 1
        return lr_evaluate(z, labels, split, num_classes=num_classes,
                           lr=lr2, wd=wd2)
