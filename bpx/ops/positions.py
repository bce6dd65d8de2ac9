"""Sinusoidal positional embeddings with padding-aware position ids.

TPU-native rendering of the reference's fairseq-derived positional module
(ref: position_embedding.py:8-80).  Two deliberate reference quirks are kept,
because the trained function depends on them:

1. The table is tensor2tensor layout — ``[sin(p·f) | cos(p·f)]`` concatenated,
   not interleaved (ref: position_embedding.py:44-60).
2. Position ids are derived from *feature channel 0* of the input stream: a
   timestep whose first feature equals 0.0 is treated as padding and receives
   the all-zero row 0 of the table (ref: transformer.py:68 passes
   ``x.transpose(0,1)[:, :, 0]`` into the embedding; make_positions at
   position_embedding.py:8-27 maps non-pad steps to ``j+1`` and pads to 0).

Everything here is shape-static: under ``jit`` the table is a compile-time
constant folded into the graph, so there is no per-step table rebuild (the
reference rebuilds/expands per device at runtime, position_embedding.py:67-74).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(num_embeddings: int, embedding_dim: int,
                     padding_idx: int | None = 0,
                     dtype=jnp.float32) -> jax.Array:
    """Build the tensor2tensor sinusoidal table.

    Row layout: ``emb[p] = [sin(p*f_0..f_{h-1}) | cos(p*f_0..f_{h-1})]`` with
    ``f_i = exp(-i * log(10000)/(h-1))``, ``h = dim // 2``; odd dims get one
    zero-pad column; row ``padding_idx`` is zeroed.
    (ref: position_embedding.py:44-60)
    """
    half_dim = embedding_dim // 2
    # Host-side numpy: this is a static constant under jit.
    if half_dim > 1:
        freq = np.exp(np.arange(half_dim, dtype=np.float64)
                      * -(math.log(10000) / (half_dim - 1)))
    else:
        freq = np.ones((half_dim,), dtype=np.float64)
    angles = np.arange(num_embeddings, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    if embedding_dim % 2 == 1:
        table = np.concatenate(
            [table, np.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx, :] = 0.0
    return jnp.asarray(table, dtype=dtype)


def padding_aware_positions(channel0: jax.Array, padding_idx: int = 0) -> jax.Array:
    """Map a (B, T) float stream of channel-0 values to position ids.

    Non-pad step at index ``j`` gets position ``j + 1``; steps whose value
    equals ``padding_idx`` (0.0) get position 0.  This is the closed form of
    the reference's masked_scatter construction (ref: position_embedding.py:8-27):
    since source and destination use the same mask in the same row-major
    order, the scatter is an identity on masked positions.
    """
    B, T = channel0.shape
    pos = jnp.arange(1, T + 1, dtype=jnp.int32)[None, :]
    is_pad = channel0 == float(padding_idx)
    return jnp.where(is_pad, 0, jnp.broadcast_to(pos, (B, T)))


def positional_embedding(x: jax.Array, dtype=None) -> jax.Array:
    """Positional embedding for a (B, T, E) stream, keyed off channel 0.

    Returns a (B, T, E) table lookup; pad steps (channel-0 == 0) get zeros.
    (ref: transformer.py:66-68 usage site)
    """
    B, T, E = x.shape
    dtype = dtype or x.dtype
    table = sinusoidal_table(T + 1, E, padding_idx=0, dtype=dtype)
    ids = padding_aware_positions(x[:, :, 0])
    return jnp.take(table, ids, axis=0)
