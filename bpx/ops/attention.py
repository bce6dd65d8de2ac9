"""Multi-head attention, TPU-first.

Functionally equivalent to the reference's fairseq-derived MHA
(ref: multihead_attention.py:10-158) with these engineering changes:

* batch-first ``(B, T, E)`` layout and einsum contractions that XLA tiles
  straight onto the MXU (the reference reshapes to ``(B·H, T, D)`` and uses
  ``bmm``);
* softmax always computed in fp32 then cast back to the compute dtype —
  same numerics as ref multihead_attention.py:121;
* query scaled by ``head_dim ** -0.5`` after projection
  (ref: multihead_attention.py:23,86);
* optional Pallas flash-attention backend that fuses the rectangular offset
  mask analytically (see bpx.ops.flash_attention);
* q/k/v projections are separate *parameters* (cleaner tensor-parallel
  sharding than the reference's packed ``in_proj_weight [3E, E]``,
  multihead_attention.py:25) but execute as ONE fused GEMM whenever the
  operand streams alias (q=k=v for self-attention, k=v for cross-attention)
  — kernels are concatenated along the output axis at trace time, which is
  bit-identical to separate GEMMs (matmul columns are independent) while
  cutting kernel launches 3x/2x; ``load_packed_qkv`` converts packed torch
  weights for parity tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.ops.masks import offset_future_mask


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          deterministic: bool = True) -> jax.Array:
    """Core attention on (B, T, H, D) tensors. q must be pre-scaled.

    Softmax in fp32 (ref: multihead_attention.py:121). ``bias`` is additive
    over (..., Tq, Tk) and broadcast to (B, H, Tq, Tk).
    """
    dtype = q.dtype
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    if dropout_rate > 0.0 and not deterministic:
        from bpx.ops.dropout import hash_dropout
        probs = hash_dropout(probs, dropout_rate, dropout_rng)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class DenseParams(nn.Module):
    """A Dense-compatible ``{kernel, bias}`` parameter pair WITHOUT the bound
    matmul, so callers can concatenate kernels into fused multi-output
    projections.  The param tree is identical to ``nn.Dense`` under the same
    name."""

    features: int
    in_features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def fused_projection(x: jax.Array, kernels, biases, dtype) -> jax.Array:
    """``x @ [W1|W2|...] + [b1|b2|...]`` — one GEMM for several projections.

    Bit-identical to applying each projection separately (each output column
    of a matmul is computed independently), so parity oracles are unaffected.
    """
    from jax.sharding import PartitionSpec as P
    from bpx.parallel.sharding import constrain
    w = jnp.concatenate([k.astype(dtype) for k in kernels], axis=1)
    # pin the concatenated view to the column-parallel layout of its parts —
    # without this, GSPMD invents a conflicting layout for the transposed
    # weight view in the backward pass (involuntary full rematerialization
    # on every attention's dW transpose)
    w = constrain(w, P(None, ("fsdp", "tensor")))
    y = jnp.dot(x.astype(dtype), w)
    if biases[0] is not None:
        y = y + jnp.concatenate([b.astype(dtype) for b in biases])
    return y


def use_bhtd_layout() -> bool:
    """Head-major q/k/v production for the flash path: the projection einsum
    emits (B, H, T, D) directly, so the kernel wrapper's (B*H, T, D) view is
    a free reshape instead of an HBM transpose (fwd q/k/v + bwd dq/dk/dv).
    Opt-out knob: BPX_QKV_BHTD=0."""
    from bpx.utils.env import env_flag
    return env_flag("BPX_QKV_BHTD", True)


def use_out_bhtd() -> bool:
    """Head-major attention OUTPUT: the kernel returns (B, H, Tq, D) and
    out_proj contracts over (h, d) directly, removing the context's HBM
    transpose (and its dO mirror in backward).  Measured -7 ms on the
    moviescope bench (PERF.md round 3); parity pinned by
    test_layout_flags_match_default.  Opt-out knob: BPX_OUT_BHTD=0."""
    from bpx.utils.env import env_flag
    return env_flag("BPX_OUT_BHTD", True)


def fused_projection_bhtd(x: jax.Array, kernels, biases, dtype,
                          num_heads: int):
    """One GEMM for several projections, emitting head-major outputs.

    ``x (B, T, E) @ stacked (E, S, H, D) -> (S, B, H, T, D)`` — same
    contraction (and numerics) as :func:`fused_projection` followed by
    reshape+transpose, but the head-major layout comes out of the GEMM,
    so no separate HBM transpose pass exists for XLA to schedule.
    Returns a tuple of S arrays shaped (B, H, T, D).
    """
    from bpx.parallel.sharding import constrain_heads
    E = kernels[0].shape[0]
    S = len(kernels)
    head_dim = kernels[0].shape[1] // num_heads
    w = jnp.stack([k.astype(dtype).reshape(E, num_heads, head_dim)
                   for k in kernels], axis=1)          # (E, S, H, D)
    # same column-parallel pin as fused_projection, expressed on the head
    # axis (only when the mesh group tiles it — see constrain_heads)
    w = constrain_heads(w, head_axis=2)
    y = jnp.einsum("bte,eshd->sbhtd", x.astype(dtype), w)
    if biases[0] is not None:
        b = jnp.stack([bb.astype(dtype).reshape(num_heads, head_dim)
                       for bb in biases])              # (S, H, D)
        y = y + b[:, None, :, None, :]
    return tuple(y[i] for i in range(S))


def head_major_out_proj(out: jax.Array, wo: jax.Array, dtype) -> jax.Array:
    """Output projection straight off the head-major (B, H, T, D) context:
    ``einsum('bhtd,hde->bte')`` over the (H, D, E) view of ``wo`` — the
    same contraction (and numerics) as reshape-to-(B, T, H*D) + matmul,
    with no transpose pass.  Pins the row-parallel sharding on the head
    axis of the weight view (mirrors the fused-projection pin; see
    constrain_heads).  Shared by MultiheadAttention and BertLayer so the
    sharding pin and contraction cannot diverge between the two stacks.
    Bias add stays at the call site."""
    from bpx.parallel.sharding import constrain_heads
    H, D = out.shape[1], out.shape[3]
    wo_v = constrain_heads(
        wo.astype(dtype).reshape(H, D, wo.shape[-1]), head_axis=0)
    return jnp.einsum("bhtd,hde->bte", out, wo_v)


class MultiheadAttention(nn.Module):
    """Multi-head attention over batch-first streams.

    Args mirror the reference module (ref: multihead_attention.py:15-23).
    Call with ``query`` only for self-attention, or ``query, key, value``
    for cross-attention; ``mask`` is an additive (Tq, Tk) [or broadcastable]
    bias, typically from :func:`bpx.ops.masks.offset_future_mask`.
    """

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"               # "xla" | "pallas"

    def setup(self):
        assert self.embed_dim % self.num_heads == 0, \
            "embed_dim must be divisible by num_heads"
        self.head_dim = self.embed_dim // self.num_heads
        self.scaling = self.head_dim ** -0.5
        proj = lambda name: DenseParams(
            self.embed_dim, self.embed_dim, use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        self.q_proj = proj("q_proj")
        self.k_proj = proj("k_proj")
        self.v_proj = proj("v_proj")
        # DenseParams (not nn.Dense) so the head-major path can contract the
        # kernel over (h, d) directly; the param tree is identical.
        self.out_proj = DenseParams(
            self.embed_dim, self.embed_dim, use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(), name="out_proj")

    def __call__(self, query: jax.Array,
                 key: Optional[jax.Array] = None,
                 value: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        key = query if key is None else key
        value = key if value is None else value
        B, Tq, _ = query.shape
        Tk = key.shape[1]
        E = self.embed_dim

        wq, bq = self.q_proj()
        wk, bk = self.k_proj()
        wv, bv = self.v_proj()
        bhtd = self.impl == "pallas" and use_bhtd_layout()
        proj = fused_projection_bhtd if bhtd else fused_projection
        pk = ((lambda x, ws, bs: proj(x, ws, bs, self.dtype, self.num_heads))
              if bhtd else
              (lambda x, ws, bs: proj(x, ws, bs, self.dtype)))
        # Fuse aliased projections into one GEMM (self-attn: q=k=v source;
        # cross-attn with a single kv stream: k=v source).
        if key is query and value is query:
            if bhtd:
                q, k, v = pk(query, (wq, wk, wv), (bq, bk, bv))
            else:
                qkv = pk(query, (wq, wk, wv), (bq, bk, bv))
                q, k, v = qkv[..., :E], qkv[..., E:2 * E], qkv[..., 2 * E:]
        elif value is key:
            if bhtd:
                (q,) = pk(query, (wq,), (bq,))
                k, v = pk(key, (wk, wv), (bk, bv))
            else:
                q = pk(query, (wq,), (bq,))
                kv = pk(key, (wk, wv), (bk, bv))
                k, v = kv[..., :E], kv[..., E:]
        else:
            if bhtd:
                (q,) = pk(query, (wq,), (bq,))
                (k,) = pk(key, (wk,), (bk,))
                (v,) = pk(value, (wv,), (bv,))
            else:
                q = pk(query, (wq,), (bq,))
                k = pk(key, (wk,), (bk,))
                v = pk(value, (wv,), (bv,))
        q = q * jnp.asarray(self.scaling, self.dtype)
        if not bhtd:
            q = q.reshape(B, Tq, self.num_heads, self.head_dim)
            k = k.reshape(B, Tk, self.num_heads, self.head_dim)
            v = v.reshape(B, Tk, self.num_heads, self.head_dim)

        dropout_rng = None
        if self.attn_dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out_bhtd = self.impl == "pallas" and use_out_bhtd()
        if self.impl == "pallas":
            from bpx.ops.flash_attention import flash_attention_maybe
            out = flash_attention_maybe(
                q, k, v, mask=mask,
                dropout_rate=self.attn_dropout, dropout_rng=dropout_rng,
                deterministic=deterministic,
                layout="bhtd" if bhtd else "bthd",
                out_layout="bhtd" if out_bhtd else "bthd")
        else:
            out = dot_product_attention(
                q, k, v, bias=mask,
                dropout_rate=self.attn_dropout, dropout_rng=dropout_rng,
                deterministic=deterministic)
        wo, bo = self.out_proj()
        if out_bhtd:
            y = head_major_out_proj(out, wo, self.dtype)
        else:
            y = out.reshape(B, Tq, self.embed_dim) @ wo.astype(self.dtype)
        if bo is not None:
            y = y + bo.astype(self.dtype)
        return y


def load_packed_qkv(in_proj_weight, in_proj_bias, out_weight, out_bias,
                    embed_dim: int):
    """Convert reference packed torch weights into this module's param dict.

    The reference packs q/k/v as rows [0:E], [E:2E], [2E:3E] of a (3E, E)
    matrix applied as ``x @ W.T`` (ref: multihead_attention.py:137-158);
    flax Dense computes ``x @ kernel``, so each slice is transposed.
    """
    import numpy as np
    w = np.asarray(in_proj_weight)
    b = np.asarray(in_proj_bias) if in_proj_bias is not None else None
    E = embed_dim
    params = {
        "q_proj": {"kernel": w[0:E].T},
        "k_proj": {"kernel": w[E:2 * E].T},
        "v_proj": {"kernel": w[2 * E:3 * E].T},
        "out_proj": {"kernel": np.asarray(out_weight).T},
    }
    if b is not None:
        params["q_proj"]["bias"] = b[0:E]
        params["k_proj"]["bias"] = b[E:2 * E]
        params["v_proj"]["bias"] = b[2 * E:3 * E]
    if out_bias is not None:
        params["out_proj"]["bias"] = np.asarray(out_bias)
    return jax.tree.map(jnp.asarray, params)
