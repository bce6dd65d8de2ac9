"""MAG — Multimodal Adaptation Gate (ref: mmtr.py:11-52).

Kept by the reference as a (dead-code) alternative to the GMU fusion
(call sites commented out at mmtr.py:355-358); provided here as a live,
selectable module for capability parity.  Math (from MAG-BERT,
Rahman et al. 2020):

  w_v = relu(W_hv [visual; text]);  w_a = relu(W_ha [acoustic; text])
  h_m = w_v * (W_v visual) + w_a * (W_a acoustic)
  alpha = min(||text|| / (||h_m|| + eps) * beta_shift, 1)
  out   = dropout(LayerNorm(alpha * h_m + text))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.ops.norm import LayerNorm


class MAG(nn.Module):
    hidden_size: int
    beta_shift: float = 1e-3
    dropout_prob: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_embedding: jax.Array, visual: jax.Array,
                 acoustic: jax.Array,
                 deterministic: bool = True,
                 return_alpha: bool = False):
        eps = 1e-6
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype,
                                      name=name)
        w_v = jax.nn.relu(dense("W_hv")(
            jnp.concatenate([visual, text_embedding], axis=-1)))
        w_a = jax.nn.relu(dense("W_ha")(
            jnp.concatenate([acoustic, text_embedding], axis=-1)))
        h_m = w_v * dense("W_v")(visual) + w_a * dense("W_a")(acoustic)

        em_norm = jnp.linalg.norm(text_embedding, axis=-1)
        hm_norm = jnp.linalg.norm(h_m, axis=-1)
        hm_norm = jnp.where(hm_norm == 0, 1.0, hm_norm)
        alpha = jnp.minimum(em_norm / (hm_norm + eps) * self.beta_shift, 1.0)
        fused = alpha[..., None] * h_m + text_embedding
        out = LayerNorm(dtype=self.dtype, name="norm")(fused)
        if self.dropout_prob > 0 and not deterministic:
            from bpx.ops.dropout import hash_dropout
            out = hash_dropout(out, self.dropout_prob,
                               self.make_rng("dropout"))
        if return_alpha:
            # the adaptation-gate magnitude, exposed like the GMU's z gates
            return out, alpha[..., None]
        return out
