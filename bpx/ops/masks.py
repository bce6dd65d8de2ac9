"""Attention masks.

The reference's rectangular "offset future mask" (ref: transformer.py:209-216):
for a (Tq, Tk) score matrix, entries above diagonal ``1 + |Tk - Tq|`` are
``-inf``.  Square case (Tq == Tk) degenerates to the standard causal
``triu(-inf, 1)``.  Cross-modal semantics: query step i may attend key steps
``j <= i + |Tk - Tq|`` — "no peeking more than 1+|src-tgt| ahead".

Masks depend only on static shapes, so under jit they are compile-time
constants; the Pallas flash-attention kernel fuses the same rule analytically
instead of materialising the matrix (see bpx.ops.flash_attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def offset_future_mask(tq: int, tk: int, dtype=jnp.float32) -> jax.Array:
    """Additive (Tq, Tk) mask: 0 where allowed, -inf above offset diagonal.

    (ref: transformer.py:209-216 ``buffered_future_mask``)
    """
    offset = abs(tk - tq)
    q = jnp.arange(tq)[:, None]
    k = jnp.arange(tk)[None, :]
    allowed = k <= q + offset          # triu(..., 1 + offset) is masked
    return jnp.where(allowed, jnp.zeros((), dtype), jnp.asarray(NEG_INF, dtype))


def key_padding_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, Tk) 1/0 validity mask -> additive (B, 1, 1, Tk) bias.

    Used by the BERT encoder (ref equivalent: HF BertModel attention_mask).
    """
    bias = jnp.where(mask.astype(bool), 0.0, NEG_INF)
    return bias[:, None, None, :].astype(dtype)
