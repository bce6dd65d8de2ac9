"""Pallas flash attention with the fused rectangular offset mask.

Covers the reference's attention semantics (q pre-scaled, fp32 softmax,
additive offset future-mask — multihead_attention.py:110-126,
transformer.py:209-216) as a tiled TPU kernel: online-softmax accumulation
over key blocks, mask applied analytically per tile (never materialised).

``flash_attention_maybe`` dispatches: the Pallas kernel when shapes are
TPU-tileable and no dropout is requested, else the XLA einsum path — both
produce identical math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _supports_pallas(q, k, dropout_rate, deterministic, mask_is_offset):
    if dropout_rate > 0.0 and not deterministic:
        return False           # dropout stays on the XLA path
    if jax.default_backend() != "tpu":
        return False
    head_dim = q.shape[-1]
    if head_dim % 128 != 0 and head_dim not in (64,):
        return False
    if q.shape[1] % 128 != 0 or k.shape[1] % 128 != 0:
        return False
    return True


def flash_attention_maybe(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: Optional[jax.Array] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          deterministic: bool = True) -> jax.Array:
    """(B, T, H, D) attention; q pre-scaled.  Pallas when eligible."""
    from bpx.ops.attention import dot_product_attention

    if _supports_pallas(q, k, dropout_rate, deterministic, mask is not None):
        from bpx.ops.pallas_attention import flash_attention
        return flash_attention(q, k, v, masked=mask is not None)
    return dot_product_attention(q, k, v, bias=mask,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng,
                                 deterministic=deterministic)
