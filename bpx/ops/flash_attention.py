"""Dispatcher: Pallas flash attention vs XLA einsum attention.

Covers the reference's attention semantics (q pre-scaled, fp32 softmax,
additive offset future-mask, dropout on the attention probabilities —
multihead_attention.py:110-126, transformer.py:209-216).

``flash_attention_maybe`` routes to the Pallas kernel
(bpx.ops.pallas_attention) whenever the backend is a TPU; the kernel
consumes raw ragged T and D (zero-padding only rare long-sequence shapes),
applies the offset band and per-sample key padding analytically, and fuses
dropout via a counter-based hash — so no shape or dropout gates remain.  Off-TPU it falls back to the XLA einsum path
(same math; dropout draws differ — same Bernoulli distribution, different
stream — documented in PARITY.md).

Set ``BPX_FORCE_PALLAS=1`` to force the (interpreted) Pallas path off-TPU,
used by the CPU equivalence tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("BPX_FORCE_PALLAS", "") == "1":
        return True
    return jax.default_backend() == "tpu"


def derive_seed(rng: jax.Array) -> jax.Array:
    """Scalar uint32 dropout seed from a PRNG key (one tiny threefry draw)."""
    return jax.random.bits(rng, (), jnp.uint32)


def flash_attention_maybe(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: Optional[jax.Array] = None,
                          kv_lens: Optional[jax.Array] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          deterministic: bool = True,
                          layout: str = "bthd",
                          out_layout: str = "bthd") -> jax.Array:
    """(B, T, H, D) attention; q pre-scaled.  Pallas on TPU backends.

    ``mask`` is the additive offset-band bias from
    :func:`bpx.ops.masks.offset_future_mask` (its presence selects the
    analytic band in the kernel); ``kv_lens`` (B,) int32 masks per-sample
    right-padding.  The einsum fallback converts ``kv_lens`` to an additive
    bias.  ``layout="bhtd"`` means inputs arrive head-major (B, H, T, D) —
    see :func:`bpx.ops.pallas_attention.flash_attention`.  The output
    follows ``out_layout``: (B, Tq, H, D) for ``"bthd"`` (default),
    head-major (B, H, Tq, D) for ``"bhtd"``.
    """
    from bpx.ops.attention import dot_product_attention

    rate = 0.0 if deterministic else float(dropout_rate)
    if _use_pallas():
        from bpx.ops.pallas_attention import flash_attention
        seed = derive_seed(dropout_rng) if rate > 0.0 else None
        return flash_attention(q, k, v, masked=mask is not None,
                               kv_lens=kv_lens, dropout_rate=rate,
                               dropout_seed=seed, layout=layout,
                               out_layout=out_layout)

    if layout == "bhtd":
        q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))

    bias = mask
    if kv_lens is not None:
        Tk = k.shape[1]
        pad = jnp.where(jnp.arange(Tk)[None, :] < kv_lens[:, None],
                        0.0, -1e30).astype(jnp.float32)
        pad = pad[:, None, None, :]                      # (B, 1, 1, Tk)
        bias = pad if bias is None else bias + pad
    out = dot_product_attention(q, k, v, bias=bias,
                                dropout_rate=dropout_rate,
                                dropout_rng=dropout_rng,
                                deterministic=deterministic)
    if out_layout == "bhtd":
        out = jnp.swapaxes(out, 1, 2)
    return out
