"""Flash-attention kernel parity vs the XLA einsum path (interpret mode on
CPU; the same kernels compile on TPU).

Covers: square + rectangular offset bands, unpadded lengths that require
internal padding (e.g. 200), head_dim 64 padding, and gradients through the
custom VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.ops.attention import dot_product_attention
from bpx.ops.masks import offset_future_mask
from bpx.ops.pallas_attention import flash_attention


def _mk(B, Tq, Tk, H, D, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Tq, H, D).astype(np.float32) * 0.3
    k = rng.randn(B, Tk, H, D).astype(np.float32) * 0.3
    v = rng.randn(B, Tk, H, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.slow
@pytest.mark.parametrize("tq,tk,masked", [
    (128, 128, True),      # square causal
    (128, 256, True),      # wide band (offset 128)
    (256, 128, True),      # tall band
    (200, 200, True),      # needs padding to 256
    (128, 200, False),     # unmasked with key padding
])
def test_flash_matches_einsum(tq, tk, masked):
    B, H, D = 1, 2, 64
    q, k, v = _mk(B, tq, tk, H, D)
    bias = offset_future_mask(tq, tk) if masked else None
    want = dot_product_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, masked=masked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_flash_gradients_match():
    B, H, D, Tq, Tk = 1, 1, 64, 128, 128
    q, k, v = _mk(B, Tq, Tk, H, D, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        bias = offset_future_mask(Tq, Tk)
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.slow
def test_flash_gradients_rectangular():
    B, H, D, Tq, Tk = 1, 1, 64, 128, 256
    q, k, v = _mk(B, Tq, Tk, H, D, seed=4)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        bias = offset_future_mask(Tq, Tk)
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")
