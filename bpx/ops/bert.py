"""Native Flax BERT text encoder.

The reference delegates text encoding to HF's torch ``BertModel``
(``bert-base-uncased``) and keeps the full last-layer hidden state sequence
(ref: mmtr.py:144-158, train.py:34).  This is a from-scratch JAX/Flax BERT
with the exact bert-base architecture (post-LN, GELU, learned absolute
positions) so that:

* it runs fully on-TPU inside the jitted train step (it is ~85% of the
  model's FLOPs at L=512 — SURVEY.md §3.2);
* HF torch checkpoints can be loaded directly via
  :func:`load_hf_bert_params` when a local checkpoint exists (zero-egress
  environments fall back to random init);
* the hidden size/layers are config-driven, enabling the tiny test config.

Numerics match HF BertModel: fp32 LayerNorm eps 1e-12, erf-GELU, softmax over
additive ``-inf`` key-padding bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.config import BertConfig
from bpx.ops.masks import key_padding_bias
from bpx.ops.norm import LayerNorm


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"    # "xla" einsum | "pallas" flash kernel

    @nn.compact
    def __call__(self, hidden, bias, kv_lens=None, deterministic=True):
        from bpx.ops.attention import (DenseParams, fused_projection,
                                       fused_projection_bhtd,
                                       use_bhtd_layout)

        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        B, T, _ = hidden.shape
        E = cfg.hidden_size
        # One fused QKV GEMM; the q/k/v param tree matches nn.Dense (and the
        # HF checkpoint importer) exactly.
        proj = lambda name: DenseParams(E, E, name=name)
        wq, bq = proj("query")()
        wk, bk = proj("key")()
        wv, bv = proj("value")()
        flash = self.attention_impl == "pallas" and kv_lens is not None
        bhtd = flash and use_bhtd_layout()
        if bhtd:
            q, k, v = fused_projection_bhtd(
                hidden, (wq, wk, wv), (bq, bk, bv), self.dtype,
                cfg.num_heads)
        else:
            qkv = fused_projection(hidden, (wq, wk, wv), (bq, bk, bv),
                                   self.dtype)
            q = qkv[..., :E].reshape(B, T, cfg.num_heads, head_dim)
            k = qkv[..., E:2 * E].reshape(B, T, cfg.num_heads, head_dim)
            v = qkv[..., 2 * E:].reshape(B, T, cfg.num_heads, head_dim)

        if flash:
            # Flash path: key padding from per-sample lengths (collate
            # guarantees a contiguous suffix), dropout fused in-kernel.
            from bpx.ops.attention import use_out_bhtd
            from bpx.ops.flash_attention import flash_attention_maybe
            rng = None
            if cfg.attention_dropout > 0 and not deterministic:
                rng = self.make_rng("dropout")
            q = q * jnp.asarray(head_dim ** -0.5, self.dtype)
            out_bhtd = use_out_bhtd()
            ctx = flash_attention_maybe(
                q, k, v, mask=None, kv_lens=kv_lens,
                dropout_rate=cfg.attention_dropout, dropout_rng=rng,
                deterministic=deterministic,
                layout="bhtd" if bhtd else "bthd",
                out_layout="bhtd" if out_bhtd else "bthd")
            if out_bhtd:
                return ctx          # (B, H, T, D); BertLayer contracts (h, d)
            return ctx.reshape(B, T, cfg.hidden_size)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        if cfg.attention_dropout > 0 and not deterministic:
            from bpx.ops.dropout import hash_dropout
            probs = hash_dropout(probs, cfg.attention_dropout,
                                 self.make_rng("dropout"))
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return ctx.reshape(B, T, cfg.hidden_size)


class BertLayer(nn.Module):
    """Post-LN transformer block (attn -> add&LN -> GELU FFN -> add&LN)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, hidden, bias, kv_lens=None, deterministic=True):
        cfg = self.config

        def dropout(x):
            if cfg.hidden_dropout <= 0 or deterministic:
                return x
            from bpx.ops.dropout import hash_dropout
            return hash_dropout(x, cfg.hidden_dropout,
                                self.make_rng("dropout"))

        attn_out = BertSelfAttention(cfg, self.dtype, self.attention_impl,
                                     name="attention")(
            hidden, bias, kv_lens, deterministic)
        # DenseParams keeps nn.Dense's param tree while letting the
        # head-major path contract (h, d) straight out of the context
        from bpx.ops.attention import DenseParams
        wo, bo = DenseParams(cfg.hidden_size, cfg.hidden_size,
                             name="attention_output")()
        if attn_out.ndim == 4:      # (B, H, T, D) head-major context
            from bpx.ops.attention import head_major_out_proj
            attn_out = head_major_out_proj(attn_out, wo, self.dtype)
        else:
            attn_out = attn_out @ wo.astype(self.dtype)
        attn_out = attn_out + bo.astype(self.dtype)
        hidden = LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="attention_norm")(hidden + dropout(attn_out))

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(hidden)
        # GELU form from config: "erf" matches HF numerics exactly; "tanh"
        # (the original google-research/bert approximation) avoids the
        # VPU-bound erf epilogue in the fc1 fusion (PERF.md round 3,
        # -63 ms/step at the bench config; perf presets set it).
        inter = jax.nn.gelu(inter, approximate=cfg.gelu == "tanh")
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        return LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(hidden + dropout(out))


class _CarryBertLayer(BertLayer):
    """(carry, y)-returning wrapper for nn.scan over the depth axis."""

    def __call__(self, hidden, bias, kv_lens=None, deterministic=True):
        return super().__call__(hidden, bias, kv_lens, deterministic), None


class BertEncoder(nn.Module):
    """Full BERT: embeddings + encoder stack; returns last hidden states.

    (ref: mmtr.py:144-158 — the reference keeps ``encoded_layers``, the full
    sequence of last-layer states, discarding the pooler output.)
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    with_pooler: bool = False   # tanh(W h[CLS]) second output (HF pooler)
    scan_layers: bool = False   # one scanned layer body instead of N copies
    remat: bool = False         # jax.checkpoint per layer (activation memory)
    attention_impl: str = "xla"  # "pallas" routes self-attn through flash
    scan_unroll: int = 1        # layers per scan iteration (lax.scan unroll)
    remat_policy: "Optional[str]" = None  # see config.ModelConfig.remat_policy

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 token_type_ids: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.config
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(T, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        hidden = word + pos
        if cfg.use_token_type:
            hidden = hidden + nn.Embed(
                cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                name="token_type_embeddings")(token_type_ids)
        hidden = LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="embeddings_norm")(hidden)
        if cfg.hidden_dropout > 0 and not deterministic:
            from bpx.ops.dropout import hash_dropout
            hidden = hash_dropout(hidden, cfg.hidden_dropout,
                                  self.make_rng("dropout"))

        pallas = self.attention_impl == "pallas"
        # Flash path: per-sample lengths replace the (B, 1, 1, T) additive
        # bias (collate guarantees padding is a contiguous suffix).
        kv_lens = attention_mask.sum(-1).astype(jnp.int32) if pallas else None
        bias = None if pallas else key_padding_bias(attention_mask,
                                                    jnp.float32)
        from bpx.ops.encoder import resolve_remat_policy
        policy = resolve_remat_policy(self.remat_policy)
        if self.scan_layers:
            layer_cls = _CarryBertLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, static_argnums=(4,),
                                     policy=policy)
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
                unroll=min(self.scan_unroll, cfg.num_layers))
            hidden, _ = scanned(cfg, self.dtype, self.attention_impl,
                                name="layers")(
                hidden, bias, kv_lens, deterministic)
        else:
            layer_cls = BertLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, static_argnums=(4,),
                                     policy=policy)
            for i in range(cfg.num_layers):
                hidden = layer_cls(cfg, self.dtype, self.attention_impl,
                                   name=f"layer{i}")(
                    hidden, bias, kv_lens, deterministic)
        if self.with_pooler:
            # HF pooler: tanh(W h[:, 0]) — the [CLS] summary the notebook
            # GMU classifiers consume (ref: DEMO_GMUs cell 56 x_l_cls).
            pooled = jnp.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                       name="pooler")(hidden[:, 0]))
            return hidden, pooled
        return hidden


# ---------------------------------------------------------------------------
# HF torch checkpoint import
# ---------------------------------------------------------------------------

def load_hf_bert_params(state_dict, config: BertConfig,
                        scan_layers: bool = False):
    """Convert an HF torch state_dict into this module's params.

    Handles both checkpoint layouts the reference CLI advertises
    (ref: train.py:34 lists ``bert-base-uncased`` and
    ``distilbert-base-uncased``; mmtr.py:148 ``from_pretrained(args.bert_model)``):

    * BertModel: ``[bert.]encoder.layer.{i}.attention.self.query...``
    * DistilBertModel: ``[distilbert.]transformer.layer.{i}.attention.q_lin...``
      (auto-detected; pair with ``BertConfig.distil()`` — no token types)

    ``scan_layers=True`` stacks the per-layer trees along a leading depth
    axis to match the nn.scan parameter layout.  Only used when a local
    checkpoint is available — no network access.
    """
    import numpy as np

    distil = any("transformer.layer." in k for k in state_dict)
    prefixes = ("", "distilbert.") if distil else ("", "bert.")

    def get(name):
        for pre in prefixes:
            if pre + name in state_dict:
                v = state_dict[pre + name]
                return np.asarray(v.numpy() if hasattr(v, "numpy") else v)
        raise KeyError(name)

    def dense(prefix):
        return {"kernel": get(f"{prefix}.weight").T,
                "bias": get(f"{prefix}.bias")}

    def norm(prefix):
        return {"scale": get(f"{prefix}.weight"),
                "bias": get(f"{prefix}.bias")}

    params = {
        "word_embeddings": {
            "embedding": get("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": get("embeddings.position_embeddings.weight")},
        "embeddings_norm": norm("embeddings.LayerNorm"),
    }
    if config.use_token_type:
        params["token_type_embeddings"] = {
            "embedding": get("embeddings.token_type_embeddings.weight")}

    def layer_tree(i):
        if distil:
            p = f"transformer.layer.{i}"
            return {
                "attention": {
                    "query": dense(f"{p}.attention.q_lin"),
                    "key": dense(f"{p}.attention.k_lin"),
                    "value": dense(f"{p}.attention.v_lin"),
                },
                "attention_output": dense(f"{p}.attention.out_lin"),
                "attention_norm": norm(f"{p}.sa_layer_norm"),
                "intermediate": dense(f"{p}.ffn.lin1"),
                "output": dense(f"{p}.ffn.lin2"),
                "output_norm": norm(f"{p}.output_layer_norm"),
            }
        p = f"encoder.layer.{i}"
        return {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
            },
            "attention_output": dense(f"{p}.attention.output.dense"),
            "attention_norm": norm(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_norm": norm(f"{p}.output.LayerNorm"),
        }

    if scan_layers:
        trees = [layer_tree(i) for i in range(config.num_layers)]
        params["layers"] = jax.tree.map(
            lambda *leaves: np.stack(leaves, axis=0), *trees)
    else:
        for i in range(config.num_layers):
            params[f"layer{i}"] = layer_tree(i)
    return jax.tree.map(jnp.asarray, params)


def maybe_load_pretrained(params: dict, config: BertConfig,
                          weights_path: Optional[str],
                          scan_layers: bool = False) -> dict:
    """Replace the 'bert' subtree of ``params`` with HF weights if available.

    ``weights_path`` may be a ``pytorch_model.bin`` / ``model.safetensors``
    file or a directory containing one.  Returns params unchanged when no
    checkpoint is found (zero-egress fallback).
    """
    import os
    if not weights_path:
        return params
    path = weights_path
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if not os.path.exists(path):
        return params
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        state_dict = load_file(path)
    else:
        import torch
        state_dict = torch.load(path, map_location="cpu")
    new = dict(params)
    new["bert"] = load_hf_bert_params(state_dict, config, scan_layers)
    return new
