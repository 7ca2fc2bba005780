"""Fused (Pallas) InfoNCE vs the reference-parity blocked implementation.

On this CPU test mesh the kernel runs in Pallas interpret mode; on TPU the
same code compiles to a flash-style Mosaic kernel. Values and gradients must
match `infonce_batched` (itself validated against the reference's
`InfoNCEBatched`, `node_shared.py:54-85`) to float32 tolerance.
"""

import jax
import jax.numpy as jnp
import pytest

from rlap_tpu.objectives.contrast import DualBranchContrast, infonce_batched
from rlap_tpu.ops.infonce_pallas import infonce_fused


def _data(n=200, f=24, seed=0):
    k = jax.random.PRNGKey(seed)
    a = jax.random.normal(k, (n, f))
    b = jax.random.normal(jax.random.fold_in(k, 1), (n, f))
    mask = jax.random.bernoulli(jax.random.fold_in(k, 2), 0.85, (n,))
    return a, b, mask


@pytest.mark.parametrize("mask_on", [False, True])
def test_forward_matches_blocked(mask_on):
    a, b, mask = _data()
    m = mask if mask_on else None
    ref = infonce_batched(a, b, tau=0.2, block_size=64, anchor_mask=m)
    new = infonce_fused(a, b, tau=0.2, anchor_mask=m,
                        block_m=128, block_n=128)
    assert jnp.allclose(ref, new, rtol=1e-5, atol=1e-5), (ref, new)


def test_grads_match_blocked():
    a, b, mask = _data(n=160, f=16, seed=3)

    def ref_loss(a, b):
        return infonce_batched(a, b, tau=0.5, block_size=32,
                               anchor_mask=mask)

    def new_loss(a, b):
        return infonce_fused(a, b, tau=0.5, anchor_mask=mask,
                             block_m=128, block_n=128)

    gr = jax.grad(ref_loss, argnums=(0, 1))(a, b)
    gn = jax.grad(new_loss, argnums=(0, 1))(a, b)
    for r, n_ in zip(gr, gn):
        assert jnp.allclose(r, n_, rtol=1e-4, atol=1e-7), \
            float(jnp.max(jnp.abs(r - n_)))


def test_dual_branch_fused_route():
    a, b, _ = _data(n=96, f=8, seed=7)
    ref = DualBranchContrast(loss="infonce_batched", mode="L2L", tau=0.2,
                             block_size=32)(h1=a, h2=b)
    new = DualBranchContrast(loss="infonce_fused", mode="L2L",
                             tau=0.2)(h1=a, h2=b)
    assert jnp.allclose(ref, new, rtol=1e-5, atol=1e-5)


def test_uneven_sizes_and_jit():
    # n not a multiple of any block size; runs under jit
    a, b, mask = _data(n=133, f=10, seed=9)
    f = jax.jit(lambda a, b: infonce_fused(a, b, tau=0.2, anchor_mask=mask))
    ref = infonce_batched(a, b, tau=0.2, block_size=64, anchor_mask=mask)
    assert jnp.allclose(f(a, b), ref, rtol=1e-5, atol=1e-5)
