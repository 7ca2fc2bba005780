"""Contrastive objectives: InfoNCE (+ anchor-row-blocked variant), JSD,
BootstrapLatent, and the dual-branch L2L/G2G/G2L sampler wiring.

Re-designed from the reference's re-implementations of PyGCL losses:
InfoNCE / InfoNCEBatched (`scripts/node_shared.py:40-85`), JSD
(`scripts/node_dedicated.py:36-53`), DualBranchContrast
(`node_shared.py:88-149`) and PyGCL's samplers. All masked, so padded
(batched-graph) inputs work; the row-blocked InfoNCE is a `lax.map` over
anchor blocks — the TPU-native form of the reference's python loop, which
keeps peak memory at O(block x N) instead of O(N x N).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _l2norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                         eps * eps))


def cosine_similarity_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """normalize-then-matmul (`node_shared.py:34-37`); hits the MXU."""
    return _l2norm(a) @ _l2norm(b).T


def same_scale_masks(n: int, dtype=jnp.float32):
    """L2L/G2G sampler masks: positives = identity, negatives = off-diagonal
    (PyGCL SameScaleSampler with intraview_negs=False)."""
    eye = jnp.eye(n, dtype=dtype)
    return eye, 1.0 - eye


def cross_scale_masks_batched(segment_ids: jax.Array, num_graphs: int,
                              node_mask: Optional[jax.Array] = None,
                              dtype=jnp.float32):
    """G2L sampler masks for a batched graph: pos[g, n] = (node n in graph g)
    (PyGCL CrossScaleSampler with `batch`). Padding nodes are neither
    positive nor negative."""
    gids = jnp.arange(num_graphs)[:, None]
    pos = (segment_ids[None, :] == gids).astype(dtype)
    valid = (segment_ids[None, :] < num_graphs).astype(dtype)
    if node_mask is not None:
        valid = valid * node_mask.astype(dtype)[None, :]
    neg = (1.0 - pos) * valid
    pos = pos * valid
    return pos, neg


def infonce(anchor: jax.Array, sample: jax.Array, pos_mask: jax.Array,
            neg_mask: jax.Array, tau: float = 0.2,
            anchor_mask: Optional[jax.Array] = None) -> jax.Array:
    """`InfoNCE.compute` (`node_shared.py:45-51`): log-softmax over the
    (pos|neg)-masked similarity row, averaged over positives then anchors."""
    sim = cosine_similarity_matrix(anchor, sample) / tau
    both = pos_mask + neg_mask
    # masked logsumexp over each anchor row
    neg_inf = jnp.asarray(-1e30, sim.dtype)
    masked = jnp.where(both > 0, sim, neg_inf)
    lse = jax.nn.logsumexp(masked, axis=1, keepdims=True)
    log_prob = sim - lse
    pos_cnt = jnp.maximum(pos_mask.sum(1), 1.0)
    loss = (log_prob * pos_mask).sum(1) / pos_cnt
    if anchor_mask is not None:
        m = anchor_mask.astype(loss.dtype)
        return -(loss * m).sum() / jnp.maximum(m.sum(), 1.0)
    return -loss.mean()


def infonce_batched(anchor: jax.Array, sample: jax.Array, tau: float = 0.2,
                    block_size: int = 1024,
                    anchor_mask: Optional[jax.Array] = None) -> jax.Array:
    """Anchor-row-blocked InfoNCE for the L2L identity-positive case
    (`InfoNCEBatched`, `node_shared.py:54-85`): peak memory O(block x N).

    Expressed as `lax.map` over statically-shaped row blocks (anchor count is
    padded up to a block multiple) so the whole loss stays inside jit.
    """
    n = anchor.shape[0]
    nblocks = -(-n // block_size)
    npad = nblocks * block_size
    a = _l2norm(anchor)
    b = _l2norm(sample)
    if anchor_mask is None:
        anchor_mask = jnp.ones((n,), bool)
    pad = npad - n
    a = jnp.pad(a, ((0, pad), (0, 0)))
    m = jnp.pad(anchor_mask, (0, pad))
    rows = a.reshape(nblocks, block_size, -1)
    row_mask = m.reshape(nblocks, block_size)
    base = (jnp.arange(nblocks) * block_size)[:, None]
    diag_idx = base + jnp.arange(block_size)[None, :]

    def block_loss(args):
        rb, mb, di = args
        sim = (rb @ b.T) / tau  # [block, N]
        lse = jax.nn.logsumexp(sim, axis=1)
        # positive = the diagonal element (identity positives)
        pos = jnp.take_along_axis(sim, jnp.clip(di, 0, n - 1)[:, None],
                                  axis=1)[:, 0]
        return jnp.where(mb, pos - lse, 0.0)

    losses = jax.lax.map(block_loss, (rows, row_mask, diag_idx))
    denom = jnp.maximum(jnp.sum(row_mask), 1.0)
    return -jnp.sum(losses) / denom


def jsd(anchor: jax.Array, sample: jax.Array, pos_mask: jax.Array,
        neg_mask: jax.Array) -> jax.Array:
    """Jensen-Shannon MI estimator (`node_dedicated.py:36-53`). Discriminator
    is the raw dot product; note the reference multiplies similarity by the
    masks *before* softplus — preserved bug-for-bug for parity."""
    log2 = jnp.log(2.0)
    sim = anchor @ sample.T
    num_pos = jnp.maximum(pos_mask.sum(), 1.0)
    num_neg = jnp.maximum(neg_mask.sum(), 1.0)
    e_pos = (log2 - jax.nn.softplus(-sim * pos_mask)).sum() / num_pos
    neg_sim = sim * neg_mask
    e_neg = (jax.nn.softplus(-neg_sim) + neg_sim - log2).sum() / num_neg
    return e_neg - e_pos


def bootstrap_latent(anchor: jax.Array, sample: jax.Array,
                     pos_mask: jax.Array) -> jax.Array:
    """PyGCL BootstrapLatent: negative mean masked cosine similarity
    (the negative-free BGRL objective, `graph_shared_g2l.py:475-477`)."""
    sim = cosine_similarity_matrix(anchor, sample)
    loss = (sim * pos_mask).sum(1) / jnp.maximum(pos_mask.sum(1), 1.0)
    valid = (pos_mask.sum(1) > 0).astype(sim.dtype)
    return -(loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)


class DualBranchContrast:
    """Two-directional contrast wiring (`node_shared.py:88-149`).

    mode: "L2L" (node-node), "G2G" (graph-graph), "G2L" (graph-node).
    loss: "infonce" | "infonce_batched" | "infonce_fused" | "jsd" |
    "bootstrap". "infonce_fused" is the Pallas flash-style kernel
    (`rlap_tpu.ops.infonce_pallas`), numerically equivalent to
    "infonce_batched" but the [N, N] similarity tiles never leave VMEM.
    """

    def __init__(self, loss: str = "infonce", mode: str = "L2L",
                 tau: float = 0.2, block_size: int = 1024):
        self.loss_name = loss
        self.mode = mode
        self.tau = tau
        self.block_size = block_size

    def _one_way(self, anchor, sample, pos_mask, neg_mask, anchor_mask):
        if self.loss_name == "infonce":
            return infonce(anchor, sample, pos_mask, neg_mask, tau=self.tau,
                           anchor_mask=anchor_mask)
        if self.loss_name == "infonce_batched":
            return infonce_batched(anchor, sample, tau=self.tau,
                                   block_size=self.block_size,
                                   anchor_mask=anchor_mask)
        if self.loss_name == "infonce_fused":
            from rlap_tpu.ops.infonce_pallas import infonce_fused
            return infonce_fused(anchor, sample, tau=self.tau,
                                 anchor_mask=anchor_mask)
        if self.loss_name == "jsd":
            return jsd(anchor, sample, pos_mask, neg_mask)
        if self.loss_name == "bootstrap":
            return bootstrap_latent(anchor, sample, pos_mask)
        raise ValueError(self.loss_name)

    def __call__(self, h1=None, h2=None, g1=None, g2=None,
                 segment_ids=None, num_graphs: Optional[int] = None,
                 h3=None, h4=None, node_mask=None):
        if self.mode == "L2L":
            if self.loss_name in ("infonce_batched", "infonce_fused"):
                l1 = self._one_way(h1, h2, None, None, node_mask)
                l2 = self._one_way(h2, h1, None, None, node_mask)
            else:
                pos, neg = same_scale_masks(h1.shape[0], h1.dtype)
                if node_mask is not None:
                    v = node_mask.astype(h1.dtype)
                    pos, neg = pos * v[None, :] * v[:, None], neg * v[None, :] * v[:, None]
                l1 = self._one_way(h1, h2, pos, neg, node_mask)
                l2 = self._one_way(h2, h1, pos, neg, node_mask)
        elif self.mode == "G2G":
            pos, neg = same_scale_masks(g1.shape[0], g1.dtype)
            l1 = self._one_way(g1, g2, pos, neg, None)
            l2 = self._one_way(g2, g1, pos, neg, None)
        elif self.mode == "G2L":
            if segment_ids is not None:
                pos, neg = cross_scale_masks_batched(
                    segment_ids, num_graphs or g1.shape[0],
                    node_mask=node_mask, dtype=g1.dtype)
                l1 = self._one_way(g1, h2, pos, neg, None)
                l2 = self._one_way(g2, h1, pos, neg, None)
            else:
                # single graph: negatives come from corrupted features
                # (`node_dedicated.py:116-124` wiring)
                n = h2.shape[0]
                sample1 = jnp.concatenate([h2, h4], axis=0)
                sample2 = jnp.concatenate([h1, h3], axis=0)
                ones = jnp.ones((1, n), g1.dtype)
                if node_mask is not None:
                    ones = ones * node_mask.astype(g1.dtype)[None, :]
                zeros = jnp.zeros((1, n), g1.dtype)
                pos = jnp.concatenate([ones, zeros], axis=1)
                neg = jnp.concatenate([zeros, ones], axis=1)
                l1 = self._one_way(g1, sample1, pos, neg, None)
                l2 = self._one_way(g2, sample2, pos, neg, None)
        else:
            raise ValueError(self.mode)
        return 0.5 * (l1 + l2)
