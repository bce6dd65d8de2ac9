"""Pallas LayerNorm for TPU.

Motivation (device trace, moviescope bench step, PERF.md round 3): XLA
lowers each (B, T, E) LayerNorm into `convert_reduce_fusion` /
`multiply_reduce_fusion` groups that measured ~0.9-3.0 ms per instance —
7-23x above the HBM floor for a 50 MB tensor — totalling ~188 ms of the
~1010 ms step.  This kernel reads the input once (in whatever dtype it
arrives — a wider-than-bf16 input costs proportionally more HBM traffic
and backward-residual memory), computes the fp32 row statistics in VMEM,
and writes the normalized output once: memory-bound by construction.

Semantics match ``flax.linen.LayerNorm`` (ref model uses torch
``nn.LayerNorm``, transformer.py:187-202 / HF BERT): fp32 statistics over
the UNTRUNCATED last axis, learned (E,) scale/bias, y cast to
``out_dtype`` (default: the input dtype; the module passes its compute
``dtype``).

``LayerNorm`` below is a drop-in module with the same param tree
(``scale``, ``bias``) as ``nn.LayerNorm``; it routes to the kernel on TPU
backends for well-tiled shapes and to the XLA formula elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 256          # rows per program


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _use_pallas_ln() -> bool:
    from bpx.utils.env import env_flag
    if not env_flag("BPX_PALLAS_LN", True):
        return False
    if env_flag("BPX_FORCE_PALLAS", False):
        return True
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ln_fwd_kernel(x_ref, s_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                  # (BLK, E)
    e = x.shape[1]
    mu = jnp.sum(x, axis=1) / e
    xc = x - mu[:, None]
    var = jnp.sum(xc * xc, axis=1) / e
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd[:, None] * s_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    # stats as (BLK, 1) columns: lane dim 1 == array dim (Mosaic allows any
    # block whose lane dim equals the array's), sublane BLK is 8-aligned
    mu_ref[...] = mu[:, None]
    rs_ref[...] = rstd[:, None]


def _ln_bwd_kernel(x_ref, s_ref, mu_ref, rs_ref, dy_ref,
                   dx_ref, ds_ref, db_ref, ds_acc, db_acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ds_acc[...] = jnp.zeros_like(ds_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = mu_ref[:, 0]
    rstd = rs_ref[:, 0]
    xhat = (x - mu[:, None]) * rstd[:, None]
    a = dy * s_ref[...].astype(jnp.float32)
    e_div = x.shape[1]
    m1 = jnp.sum(a, axis=1) / e_div
    m2 = jnp.sum(a * xhat, axis=1) / e_div
    dx = rstd[:, None] * (a - m1[:, None] - xhat * m2[:, None])
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # param grads accumulate in VMEM scratch across the (sequential on TPU)
    # grid; written once by the final program
    ds_acc[...] += jnp.sum(dy * xhat, axis=0)[None, :]
    db_acc[...] += jnp.sum(dy, axis=0)[None, :]

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        ds_ref[...] = ds_acc[...]
        db_ref[...] = db_acc[...]


def _pick_blk(n: int) -> int:
    """Largest row-tile <= _BLK dividing n with sublane alignment."""
    for blk in (_BLK, 128, 64, 32, 16, 8):
        if n % blk == 0:
            return blk
    return 0


def _ln_fwd(x2, scale, bias, eps: float, out_dtype):
    n, e = x2.shape
    blk = _pick_blk(n)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((blk, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, e), lambda i: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), out_dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=_interpret())(x2, scale[None, :], bias[None, :])
    return y, mu, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layer_norm(x2, scale, bias, eps: float, out_dtype):
    y, _, _ = _ln_fwd(x2, scale, bias, eps, out_dtype)
    return y


def _layer_norm_fwd(x2, scale, bias, eps, out_dtype):
    y, mu, rstd = _ln_fwd(x2, scale, bias, eps, out_dtype)
    return y, (x2, scale, mu, rstd)


def _layer_norm_bwd(eps, out_dtype, res, dy):
    x2, scale, mu, rstd = res
    n, e = x2.shape
    blk = _pick_blk(n)
    dx, ds_p, db_p = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((blk, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((blk, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), x2.dtype),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, e), jnp.float32),
                        pltpu.VMEM((1, e), jnp.float32)],
        interpret=_interpret())(x2, scale[None, :], mu, rstd, dy)
    return dx, ds_p[0], db_p[0]


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5, out_dtype=None) -> jax.Array:
    """LayerNorm over the last axis; fp32 stats on the UNTRUNCATED input
    (flax ``nn.LayerNorm`` semantics), output in ``out_dtype`` (default:
    x.dtype).

    Pallas kernel on TPU for row-tileable shapes; XLA formula otherwise
    (identical math — fp32 mean/var with 1/E normalisation, rsqrt).
    """
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)
    e = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    # Lane-aligned widths only: for E % 128 != 0 (e.g. iemocap's hidden 300)
    # Mosaic pads every VMEM tile to the next 128-lane multiple and the
    # wasted lanes made the kernel a measured net loss (iemocap preset
    # 2256 -> 2390 ms/step); XLA's fused formula handles those shapes
    # better.  An explicitly lane-padded variant (zero-pad E to the next
    # 128 multiple at the kernel boundary, true width threaded into the
    # row statistics) lost every hardware A/B too — +184 ms on the einsum
    # path, +143 ms on the flash path at the iemocap preset (PERF.md
    # round 4) — and was deleted.  BPX_FORCE_PALLAS=1 (tests) still
    # exercises the kernel on unaligned widths.
    from bpx.utils.env import env_flag
    aligned = e % 128 == 0 or env_flag("BPX_FORCE_PALLAS", False)
    if _use_pallas_ln() and n >= 8 and _pick_blk(n) and aligned:
        y = _layer_norm(x.reshape(n, e), scale.astype(jnp.float32),
                        bias.astype(jnp.float32), float(eps), out_dtype)
        return y.reshape(x.shape)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class LayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same ``scale``/``bias`` param tree)
    routing through :func:`layer_norm`."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        e = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (e,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (e,), jnp.float32)
        # honor the dtype field like nn.LayerNorm: fp32 stats on the
        # untruncated input, output cast to the module's compute dtype
        return layer_norm(x, scale, bias, self.epsilon,
                          out_dtype=self.dtype)
