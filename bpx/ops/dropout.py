"""Fused hash-based dropout for the XLA paths.

``jax.random.bernoulli`` lowers to a standalone ``rng-bit-generator`` op
that materialises 32 random bits per element in HBM, which the consumer
then re-reads (the device trace showed ~190 ms/step of pure mask traffic
on the headline bench).  Dropout only needs a Bernoulli draw, not a
reproducible ``jax.random`` stream, so these helpers derive the keep mask
from a murmur3-finalized hash of the element index mixed with a seed taken
from the PRNG key's raw data — pure elementwise ALU that XLA fuses into the
surrounding pass: zero HBM traffic, zero extra kernels, deterministic in
the key exactly like the bernoulli version (same key -> same mask).

Distribution parity: i.i.d. Bernoulli(1-rate), identical to the reference's
``F.dropout``; the draw stream differs from both torch's and jax.random's
(any JAX port already differs from torch here — documented in PARITY.md).
The same construction runs inside the Pallas flash kernels
(bpx.ops.pallas_attention._keep_mask), so fused-attention dropout and XLA
dropout share one mechanism.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def seed_from_key(rng: jax.Array) -> jax.Array:
    """Scalar uint32 seed from a PRNG key's raw data (no generator call).

    ``make_rng``/``fold_in`` already make the key unique per call site and
    step; mixing its words preserves that uniqueness.
    """
    data = jax.random.key_data(rng).astype(jnp.uint32).reshape(-1)
    seed = data[0] * jnp.uint32(0x9E3779B1)
    for i in range(1, int(data.shape[0])):
        seed = (seed ^ data[i]) * jnp.uint32(0x85EBCA6B)
    return seed


def _hash_keep(seed: jax.Array, shape, rate: float) -> jax.Array:
    """Bernoulli(1-rate) keep mask: murmur3 finalizer over the linear
    element index + seed.  Lowers to iota + a few vector int ops — fully
    fusable."""
    n = int(np.prod(shape))
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    x = idx * jnp.uint32(0x9E3779B9) + seed
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return x >= threshold


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _hash_dropout(x: jax.Array, rate: float, seed: jax.Array) -> jax.Array:
    keep = _hash_keep(seed, x.shape, rate)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _hash_dropout_fwd(x, rate, seed):
    # Residual is the scalar seed only: the keep mask is a pure function of
    # (seed, element index), so the backward pass regenerates it instead of
    # saving a pred[shape] byte-mask (which dominates activation memory on
    # no-remat paths).
    return _hash_dropout(x, rate, seed), seed


def _hash_dropout_bwd(rate, seed, g):
    keep = _hash_keep(seed, g.shape, rate)
    return (jnp.where(keep, g / (1.0 - rate), 0.0).astype(g.dtype), None)


_hash_dropout.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def hash_dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Inverted dropout with the fused hash mask (training mode).

    Callers gate on ``rate > 0 and not deterministic`` like before.
    The backward pass recomputes the mask from the seed (custom_vjp) —
    zero residual memory beyond a scalar.
    """
    return _hash_dropout(x, float(rate), seed_from_key(rng))
