"""Fused blocked InfoNCE as a Pallas TPU kernel.

The reference's `InfoNCEBatched` (`scripts/node_shared.py:54-85`) blocks the
N x N cosine-similarity matrix over anchor rows to bound peak memory. The
TPU-native version goes one step further: a flash-attention-style streaming
kernel where each (row-block, col-block) tile of the similarity matrix is
computed on the MXU *inside VMEM* and immediately folded into a running
(max, sum-exp, positive-logit) accumulator — the full [N, N] matrix never
touches HBM, in the forward OR backward pass. The backward recomputes each
tile's softmax from the saved row logsumexp (the standard flash recompute
trick), so residual memory is O(N) instead of O(N^2).

Identity-positive semantics only (the L2L case the reference batches):
per anchor i the contribution is  sim[i, i] - logsumexp_j sim[i, j].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# forward: streaming logsumexp + diagonal extraction
# --------------------------------------------------------------------------

def _fwd_kernel(a_ref, b_ref, out_ref, lse_ref, m_ref, s_ref, pos_ref,
                *, inv_tau: float, n: int, bm: int, bn: int, nc: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        s_ref[:] = jnp.zeros_like(s_ref)
        pos_ref[:] = jnp.zeros_like(pos_ref)

    sim = jnp.dot(a_ref[:], b_ref[:].T,
                  preferred_element_type=jnp.float32) * inv_tau
    cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    valid = cols < n
    sim = jnp.where(valid, sim, _NEG_BIG)

    blk_max = jnp.max(sim, axis=1, keepdims=True)
    m_new = jnp.maximum(m_ref[:], blk_max)
    s_ref[:] = (s_ref[:] * jnp.exp(m_ref[:] - m_new)
                + jnp.sum(jnp.exp(sim - m_new), axis=1, keepdims=True))
    m_ref[:] = m_new
    pos_ref[:] += jnp.sum(jnp.where((rows == cols) & valid, sim, 0.0),
                          axis=1, keepdims=True)

    @pl.when(j == nc - 1)
    def _():
        lse = jnp.log(s_ref[:]) + m_ref[:]
        lse_ref[:] = lse
        out_ref[:] = pos_ref[:] - lse


# --------------------------------------------------------------------------
# backward: dA accumulated over column blocks, dB over row blocks.
# coef[i, j] = (g_i / tau) * (1[i == j] - p_ij),  p_ij = exp(sim_ij - lse_i)
# dA[i] = coef @ B ;  dB[j] = coef.T @ A
# --------------------------------------------------------------------------

def _tile_coef(a, b, lse, g, i, j, *, inv_tau, n, bm, bn):
    sim = jnp.dot(a, b.T, preferred_element_type=jnp.float32) * inv_tau
    cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    valid = cols < n
    p = jnp.where(valid, jnp.exp(sim - lse), 0.0)
    onehot = ((rows == cols) & valid).astype(jnp.float32)
    return (onehot - p) * (g * inv_tau)


def _bwd_da_kernel(a_ref, b_ref, lse_ref, g_ref, da_ref, acc_ref,
                   *, inv_tau: float, n: int, bm: int, bn: int, nc: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    coef = _tile_coef(a_ref[:], b_ref[:], lse_ref[:], g_ref[:], i, j,
                      inv_tau=inv_tau, n=n, bm=bm, bn=bn)
    acc_ref[:] += jnp.dot(coef, b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == nc - 1)
    def _():
        da_ref[:] = acc_ref[:]


def _bwd_db_kernel(a_ref, b_ref, lse_ref, g_ref, db_ref, acc_ref,
                   *, inv_tau: float, n: int, bm: int, bn: int, nr: int):
    j = pl.program_id(0)  # column block (outer)
    i = pl.program_id(1)  # row block (inner, accumulated)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    coef = _tile_coef(a_ref[:], b_ref[:], lse_ref[:], g_ref[:], i, j,
                      inv_tau=inv_tau, n=n, bm=bm, bn=bn)
    acc_ref[:] += jax.lax.dot_general(
        coef, a_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nr - 1)
    def _():
        db_ref[:] = acc_ref[:]


# --------------------------------------------------------------------------
# custom-VJP core on padded, already-normalized inputs
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _core(a, b, tau, n, bm, bn):
    out, _ = _core_fwd_impl(a, b, tau, n, bm, bn)
    return out


def _core_fwd_impl(a, b, tau, n, bm, bn):
    npad, f = a.shape
    nr, nc = npad // bm, npad // bn
    kern = functools.partial(_fwd_kernel, inv_tau=1.0 / tau, n=n,
                             bm=bm, bn=bn, nc=nc)
    out, lse = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec((bm, f), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, f), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        scratch_shapes=[_vmem((bm, 1)), _vmem((bm, 1)), _vmem((bm, 1))],
        interpret=_interpret(),
    )(a, b)
    return out[:, 0], lse


def _vmem(shape):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.VMEM(shape, jnp.float32)


def _core_fwd(a, b, tau, n, bm, bn):
    out, lse = _core_fwd_impl(a, b, tau, n, bm, bn)
    return out, (a, b, lse)


def _core_bwd(tau, n, bm, bn, res, g_out):
    a, b, lse = res
    npad, f = a.shape
    nr, nc = npad // bm, npad // bn
    g = g_out.reshape(npad, 1).astype(jnp.float32)

    da = pl.pallas_call(
        functools.partial(_bwd_da_kernel, inv_tau=1.0 / tau, n=n,
                          bm=bm, bn=bn, nc=nc),
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec((bm, f), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, f), lambda i, j: (j, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, f), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, f), jnp.float32),
        scratch_shapes=[_vmem((bm, f))],
        interpret=_interpret(),
    )(a, b, lse, g)

    db = pl.pallas_call(
        functools.partial(_bwd_db_kernel, inv_tau=1.0 / tau, n=n,
                          bm=bm, bn=bn, nr=nr),
        grid=(nc, nr),
        in_specs=[
            pl.BlockSpec((bm, f), lambda j, i: (i, 0)),
            pl.BlockSpec((bn, f), lambda j, i: (j, 0)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, f), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, f), jnp.float32),
        scratch_shapes=[_vmem((bn, f))],
        interpret=_interpret(),
    )(a, b, lse, g)

    return da.astype(a.dtype), db.astype(b.dtype)


_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def _l2norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                         eps * eps))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def infonce_fused(anchor: jax.Array, sample: jax.Array, tau: float = 0.2,
                  anchor_mask=None, block_m: int = 256,
                  block_n: int = 512) -> jax.Array:
    """Identity-positive InfoNCE, fused on TPU.

    Drop-in for `objectives.contrast.infonce_batched` (reference semantics:
    `InfoNCEBatched.compute`, `node_shared.py:60-85`): mean over valid
    anchors of -(sim[i, i] - logsumexp_j sim[i, j]) on cosine similarities.
    L2 normalization, anchor masking, and the mean stay in plain JAX so
    autodiff composes them with the kernel's custom VJP.
    """
    n, f = anchor.shape
    bm = min(block_m, _round_up(n, 128))
    bn = min(block_n, _round_up(n, 128))
    npad = _round_up(n, int(np.lcm(bm, bn)))
    fpad = _round_up(f, 128)

    a = _l2norm(anchor.astype(jnp.float32))
    b = _l2norm(sample.astype(jnp.float32))
    a = jnp.pad(a, ((0, npad - n), (0, fpad - f)))
    b = jnp.pad(b, ((0, npad - n), (0, fpad - f)))

    per_row = _core(a, b, float(tau), n, bm, bn)[:n]
    if anchor_mask is None:
        return -jnp.mean(per_row)
    m = anchor_mask.astype(per_row.dtype)
    return -jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)
