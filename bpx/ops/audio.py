"""Audio conv encoders.

TPU rendering of the reference audio stacks (ref: mmtr.py:55-141).  Layout is
``(B, T, C)`` (NWC — the native XLA conv layout on TPU); the models transpose
from the data pipeline's reference-style ``(B, C, T)``.

The adaptive average pool is lowered to a single matmul against a static
(T_out, T_in) averaging matrix — identical math to torch's
``AdaptiveAvgPool1d`` (output bin i averages ``input[floor(i*L/out) :
ceil((i+1)*L/out)]``), but expressed as a GEMM the MXU executes directly
instead of a gather/reduce.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def adaptive_avg_pool_matrix(t_in: int, t_out: int,
                             dtype=jnp.float32) -> jax.Array:
    """Static (t_out, t_in) matrix M with M @ x == AdaptiveAvgPool1d(t_out)(x)."""
    m = np.zeros((t_out, t_in), dtype=np.float64)
    for i in range(t_out):
        start = (i * t_in) // t_out
        end = -(-((i + 1) * t_in) // t_out)      # ceil
        m[i, start:end] = 1.0 / (end - start)
    return jnp.asarray(m, dtype=dtype)


def adaptive_avg_pool1d(x: jax.Array, t_out: int) -> jax.Array:
    """(B, T, C) -> (B, t_out, C) via the static pooling GEMM."""
    t_in = x.shape[1]
    if t_in == t_out:
        return x
    m = adaptive_avg_pool_matrix(t_in, t_out, x.dtype)
    return jnp.einsum("ot,btc->boc", m, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


class GemmConv1d(nn.Module):
    """VALID Conv1d lowered to one gather + one GEMM.

    XLA's native lowering of the reference's wide-kernel convs
    (k=128, 96 channels) runs at <1% MXU utilisation (~123 ms/step of the
    headline bench).  Unfolding the input with a single gather
    (``x[:, t*stride + k, :]``) and contracting ``(K, Cin)`` against the
    kernel in one ``dot_general`` puts the same math on the MXU at a few
    GB of patch traffic instead (~100x faster here).  The gather's VJP is
    one scatter-add, so the backward stays a GEMM + one scatter.

    Parameter tree is identical to ``nn.Conv`` — ``kernel (K, Cin, Cout)``
    (same lecun-normal fan = K*Cin) and ``bias (Cout,)`` — so checkpoints
    and the torch-oracle parity tests are unaffected.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        K, s = self.kernel_size, self.stride
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (K, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        t_out = (x.shape[1] - K) // s + 1
        idx = (jnp.arange(t_out) * s)[:, None] + jnp.arange(K)[None, :]
        patches = x[:, idx, :]                      # (B, T_out, K, Cin)
        y = jax.lax.dot_general(
            patches.astype(self.dtype), kernel.astype(self.dtype),
            (((2, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + bias.astype(jnp.float32)).astype(self.dtype)


class AudioEncoder(nn.Module):
    """Two strided Conv1d layers + adaptive average pool.

    Parameterised over the three reference variants:
    * moviescope: Conv1d(96,96,k=128,s=2) x2 + pool(200) (ref: mmtr.py:93-108)
    * cmumosei:   Conv1d(74,74,k=5,s=2)  x2 + pool(20)  (ref: mmtr.py:110-125)
    * cmumosi:    Conv1d(5,5,k=20,s=1)   x2 + pool(5)   (ref: mmtr.py:127-141)

    The reference hard-codes channels == in-channels and VALID padding; both
    kept.  ``pool_target`` is num_vectors_a in the models.  Convs are
    GEMM-lowered (:class:`GemmConv1d`).
    """

    channels: int
    kernel_size: int
    stride: int
    pool_target: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, C) -> (B, pool_target, C)."""
        t = x.shape[1]
        min_t = self.kernel_size + self.stride * (self.kernel_size - 1) + 1
        if t < min_t:
            raise ValueError(
                f"audio stream of {t} frames is too short for two "
                f"Conv1d(k={self.kernel_size}, s={self.stride}) layers; "
                f"need >= {min_t} (set data.audio_raw_len accordingly)")
        for i in range(2):
            x = GemmConv1d(features=self.channels,
                           kernel_size=self.kernel_size,
                           stride=self.stride,
                           dtype=self.dtype, name=f"conv{i+1}")(x)
        return adaptive_avg_pool1d(x, self.pool_target)


AUDIO_ENCODER_VARIANTS = {
    # name -> (channels, kernel, stride); pool target comes from the model
    # config's num_vectors_a.
    "moviescope": (96, 128, 2),
    "cmumosei": (74, 5, 2),
    "cmumosi": (5, 20, 1),
}


def make_audio_encoder(variant: str, channels: int, pool_target: int,
                       dtype=jnp.float32) -> AudioEncoder:
    """Factory; ``channels`` may override the canonical channel count so the
    same variant works for any orig_d_a."""
    if variant not in AUDIO_ENCODER_VARIANTS:
        raise KeyError(f"unknown audio encoder variant {variant!r}")
    _, kernel, stride = AUDIO_ENCODER_VARIANTS[variant]
    return AudioEncoder(channels=channels, kernel_size=kernel, stride=stride,
                        pool_target=pool_target, dtype=dtype,
                        name="audio_enc")


class AudioEncoderLarge(nn.Module):
    """Conv1d(128,128,k=128)+BN+ReLU+MaxPool(2), three active blocks.

    Kept for capability parity; the reference defines it but never
    instantiates it (ref: mmtr.py:55-90; its conv4 is dead code at line 89).
    Uses BatchNorm — callers must handle the ``batch_stats`` collection.
    """

    channels: int = 128
    kernel_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(3):
            x = nn.Conv(features=self.channels,
                        kernel_size=(self.kernel_size,), strides=(1,),
                        padding="VALID", dtype=self.dtype,
                        name=f"conv{i+1}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"bn{i+1}")(x)
            x = jax.nn.relu(x)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        return x
