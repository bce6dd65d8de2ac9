"""Pre-LN transformer encoder with self / crossmodal / biprojection modes.

TPU-native rebuild of the reference encoder (ref: transformer.py:9-216) in
batch-first ``(B, T, E)`` layout.  One class serves all three modes, exactly
like the reference:

* **self**: standard pre-LN self-attention block (ref: transformer.py:158-159);
* **cross**: Q from ``x``, K/V from the other modality, with the *shared*
  LayerNorm 0 applied to both query and key/value streams
  (ref: transformer.py:170-173);
* **biprojection**: a self-attention sublayer, residual, then a cross-attention
  sublayer re-using the *same attention weights*, whose query is the
  un-normalised sublayer output while K/V get LayerNorm 1; the FFN uses
  LayerNorm 2 (ref: transformer.py:160-169,136-139).  The weight sharing
  between the two sublayers is a real property of the reference model and is
  preserved.

Since ``normalize_before=True`` (ref: transformer.py:132), every
``maybe_layer_norm(..., after=True)`` call in the reference is an identity —
this implementation writes the resulting pure pre-LN dataflow directly.

The stack (ref: transformer.py:52-93) scales inputs by ``sqrt(embed_dim)``,
adds channel-0-keyed sinusoidal positions, applies embedding dropout, runs the
layers (K/V streams embedded once and reused by every layer), and always ends
with a final LayerNorm.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.ops.attention import MultiheadAttention
from bpx.ops.masks import offset_future_mask
from bpx.ops.norm import LayerNorm
from bpx.ops.positions import positional_embedding


def resolve_remat_policy(name: Optional[str]):
    """Map a config policy name to a jax.checkpoint policy (None = full)."""
    if name is None:
        return None
    if name == "save_attn":
        from bpx.ops.pallas_attention import SAVE_ATTN_POLICY
        return SAVE_ATTN_POLICY
    raise ValueError(f"unknown remat_policy: {name!r}")


class TransformerEncoderLayer(nn.Module):
    """One encoder layer; mode is decided by call arguments + ``biprojection``.

    (ref: transformer.py:102-202)
    """

    embed_dim: int
    num_heads: int = 4
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    attn_mask: bool = False
    biprojection: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"

    def setup(self):
        self.attn = MultiheadAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            attn_dropout=self.attn_dropout, dtype=self.dtype,
            impl=self.attention_impl, name="attn")
        n_norms = 3 if self.biprojection else 2
        self.norms = [LayerNorm(dtype=self.dtype, name=f"ln{i}")
                      for i in range(n_norms)]
        dense = lambda feat, name: nn.Dense(
            feat, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name=name)
        self.fc1 = dense(4 * self.embed_dim, "fc1")
        self.fc2 = dense(self.embed_dim, "fc2")

    def _dropout(self, x, rate, deterministic):
        if rate <= 0.0 or deterministic:
            return x
        from bpx.ops.dropout import hash_dropout
        return hash_dropout(x, rate, self.make_rng("dropout"))

    def __call__(self, x: jax.Array,
                 x_k: Optional[jax.Array] = None,
                 x_v: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """``x_v=None`` with ``x_k`` given means "V aliases K" — the stack
        passes the aliasing explicitly (identity checks don't survive
        scan/remat tracer boundaries) so the attention fuses the k/v GEMMs."""
        Tq = x.shape[1]

        residual = x
        if x_k is None:
            # --- self-attention mode (ref: transformer.py:158-159)
            mask = (offset_future_mask(Tq, Tq, jnp.float32)
                    if self.attn_mask else None)
            h = self.norms[0](x)
            h = self.attn(h, mask=mask, deterministic=deterministic)
        elif self.biprojection:
            # --- biprojection mode (ref: transformer.py:160-169)
            mask = (offset_future_mask(Tq, Tq, jnp.float32)
                    if self.attn_mask else None)
            h = self.norms[0](x)
            h = self.attn(h, mask=mask, deterministic=deterministic)
            h = self._dropout(h, self.res_dropout, deterministic)
            x = residual + h
            residual = x
            Tk = x_k.shape[1]
            mask = (offset_future_mask(Tq, Tk, jnp.float32)
                    if self.attn_mask else None)
            # K/V come from the same stream in every model call site; compute
            # the LN once so the attention fuses the k/v GEMMs.
            k = self.norms[1](x_k)
            v = k if x_v is None else self.norms[1](x_v)
            # Query is the un-normalised sublayer output (the reference's
            # maybe_layer_norm(0, x, after=True) is an identity under pre-LN).
            h = self.attn(x, k, v, mask=mask, deterministic=deterministic)
        else:
            # --- crossmodal mode (ref: transformer.py:170-173): LN0 shared
            # between the query and the key/value streams.
            Tk = x_k.shape[1]
            mask = (offset_future_mask(Tq, Tk, jnp.float32)
                    if self.attn_mask else None)
            q = self.norms[0](x)
            k = self.norms[0](x_k)
            v = k if x_v is None else self.norms[0](x_v)
            h = self.attn(q, k, v, mask=mask, deterministic=deterministic)

        h = self._dropout(h, self.res_dropout, deterministic)
        x = residual + h

        # --- FFN sublayer (ref: transformer.py:181-195)
        ffn_ln = self.norms[2] if self.biprojection else self.norms[1]
        residual = x
        h = ffn_ln(x)
        h = jax.nn.relu(self.fc1(h))
        h = self._dropout(h, self.relu_dropout, deterministic)
        h = self.fc2(h)
        h = self._dropout(h, self.res_dropout, deterministic)
        return residual + h


class _CarryEncoderLayer(TransformerEncoderLayer):
    """(carry, y)-returning wrapper for nn.scan over the depth axis."""

    def __call__(self, x, x_k=None, x_v=None, deterministic=True):
        return super().__call__(x, x_k, x_v, deterministic), None


class TransformerEncoder(nn.Module):
    """Stack of encoder layers with scaled inputs + sinusoidal positions.

    (ref: transformer.py:9-99)
    """

    embed_dim: int
    num_heads: int
    layers: int
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = False
    biprojection: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    # scan_layers stacks the depth into one lax.scan body — one traced layer
    # instead of `layers` copies (compile-time and HLO-size win; the layer
    # weights become (layers, ...) stacked).  remat wraps each layer in
    # jax.checkpoint, trading recompute for activation memory.
    scan_layers: bool = False
    remat: bool = False
    scan_unroll: int = 1
    remat_policy: Optional[str] = None

    def setup(self):
        self.embed_scale = math.sqrt(self.embed_dim)
        layer_kw = dict(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            attn_dropout=self.attn_dropout, relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout, attn_mask=self.attn_mask,
            biprojection=self.biprojection, dtype=self.dtype,
            attention_impl=self.attention_impl)
        policy = resolve_remat_policy(self.remat_policy)
        if self.scan_layers:
            layer_cls = _CarryEncoderLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, static_argnums=(4,),
                                     policy=policy)
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.layers,
                unroll=min(self.scan_unroll, self.layers))
            self.blocks = scanned(**layer_kw, name="layers")
        else:
            layer_cls = TransformerEncoderLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, static_argnums=(4,),
                                     policy=policy)
            self.blocks = [layer_cls(**layer_kw, name=f"layer{i}")
                           for i in range(self.layers)]
        self.final_norm = LayerNorm(dtype=self.dtype, name="final_norm")

    def _dropout(self, x, rate, deterministic):
        if rate <= 0.0 or deterministic:
            return x
        from bpx.ops.dropout import hash_dropout
        return hash_dropout(x, rate, self.make_rng("dropout"))

    def _embed(self, x_in, deterministic):
        # Scale + channel-0-keyed positions (ref: transformer.py:66-68).
        x = self.embed_scale * x_in
        x = x + positional_embedding(x_in, dtype=x.dtype)
        return self._dropout(x, self.embed_dropout, deterministic)

    def __call__(self, x_in: jax.Array,
                 x_in_k: Optional[jax.Array] = None,
                 x_in_v: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        x = self._embed(x_in, deterministic)
        x_k = x_v = None
        if x_in_k is not None and x_in_v is not None:
            x_k = self._embed(x_in_k, deterministic)
            # The reference embeds K and V separately, which only differs
            # when embed-dropout draws differ (transformer.py:71-79); when
            # the computation is exactly identical, keep x_v=None ("V
            # aliases K") so the layers fuse their k/v projections.
            if not (x_in_v is x_in_k
                    and (deterministic or self.embed_dropout <= 0.0)):
                x_v = self._embed(x_in_v, deterministic)
        if self.scan_layers:
            x, _ = self.blocks(x, x_k, x_v, deterministic)
        else:
            for block in self.blocks:
                x = block(x, x_k, x_v, deterministic)
        return self.final_norm(x)
