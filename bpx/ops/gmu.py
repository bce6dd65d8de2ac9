"""Gated Multimodal Unit (GMU) family.

The paper's fusion primitives (Arevalo et al., arXiv:1702.01992), rebuilt as
fused TPU ops.  Every variant computes sigmoid gates from the concatenation of
all inputs and tanh-projected hidden states per input; all projections are
bias-free (ref: mmtr.py:161-273).  Each returns ``(fused, gates)`` where
``gates`` is the concatenation of all gate activations — the framework's
interpretability channel (ref: train.py:272-277, utils/utils.py:79-80).

Implementation notes (TPU):
* the N gate projections share the same input ``concat(xs)``; they are fused
  into ONE matmul with a (sum_in, N*out) kernel so the MXU sees a single
  large GEMM instead of N skinny ones;
* elementwise sigmoid/tanh/multiply fuse into the matmul epilogue under XLA.

Variants:
* :class:`GatedBimodalLayer` — classic 2-input GMU:
  ``z*tanh(W1 x1) + (1-z)*tanh(W2 x2)`` (ref: mmtr.py:161-177).
* :class:`GatedBimodalFusionLayer` — the paper's "Fusion-GMU" which also
  multiplies by the raw input: ``z*h1*x1 + (1-z)*h2*x2``
  (ref: mmtr.py:179-195); used for sequence-level middle/top fusion.
* :class:`GatedNModalLayer` — N-input generalisation with one gate per input
  (ref: mmtr.py:249-273 ``TextShiftingNLayer``).  This also serves as the
  *corrected* form of the reference's ``TextShifting3Layer`` /
  ``TextShifting4Layer``: the 3-input variant in the reference has broken
  arity and gate sizing (ref: mmtr.py:199-219 — 5 ctor args, call sites pass
  4, gate layers sized for 4 inputs but fed 3); we implement the intended,
  internally consistent behaviour and document the divergence here.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _dense(features: int, name: str, dtype) -> nn.Dense:
    return nn.Dense(features, use_bias=False, dtype=dtype,
                    kernel_init=nn.initializers.lecun_normal(), name=name)


class GatedBimodalLayer(nn.Module):
    """2-input GMU (ref: mmtr.py:161-177)."""

    size_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        h1 = jnp.tanh(_dense(self.size_out, "hidden1", self.dtype)(x1))
        h2 = jnp.tanh(_dense(self.size_out, "hidden2", self.dtype)(x2))
        x_cat = jnp.concatenate([x1, x2], axis=-1)
        z = jax.nn.sigmoid(_dense(self.size_out, "x_gate", self.dtype)(x_cat))
        fused = z * h1 + (1.0 - z) * h2
        return fused, jnp.concatenate([z, 1.0 - z], axis=-1)


class GatedBimodalFusionLayer(nn.Module):
    """2-input Fusion-GMU with raw-input multiply (ref: mmtr.py:179-195).

    ``fused = z * tanh(W1 x1) * x1 + (1-z) * tanh(W2 x2) * x2`` — requires
    size_out == feature dim of the inputs (as at every reference call site).
    """

    size_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        h1 = jnp.tanh(_dense(self.size_out, "hidden1", self.dtype)(x1))
        h2 = jnp.tanh(_dense(self.size_out, "hidden2", self.dtype)(x2))
        x_cat = jnp.concatenate([x1, x2], axis=-1)
        z = jax.nn.sigmoid(_dense(self.size_out, "x_gate", self.dtype)(x_cat))
        fused = z * h1 * x1 + (1.0 - z) * h2 * x2
        return fused, jnp.concatenate([z, 1.0 - z], axis=-1)


class GatedNModalLayer(nn.Module):
    """N-input GMU: ``sum_i sigmoid(Wg_i [x1..xn]) * tanh(W_i x_i)``.

    (ref: mmtr.py:249-273 ``TextShiftingNLayer``; also the corrected
    TextShifting3/4Layer — see module docstring.)

    The N gate matmuls are fused into a single (sum_in, N*size_out) GEMM.
    """

    n_inputs: int
    size_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array]
                 ) -> Tuple[jax.Array, jax.Array]:
        assert len(xs) == self.n_inputs, \
            f"expected {self.n_inputs} inputs, got {len(xs)}"
        hs = [jnp.tanh(_dense(self.size_out, f"hidden{i+1}", self.dtype)(x))
              for i, x in enumerate(xs)]
        x_cat = jnp.concatenate(list(xs), axis=-1)
        # One fused gate GEMM: (.., sum_in) @ (sum_in, N*out).
        gates = _dense(self.n_inputs * self.size_out, "x_gates",
                       self.dtype)(x_cat)
        z = jax.nn.sigmoid(gates)
        zs = jnp.split(z, self.n_inputs, axis=-1)
        fused = sum(z_i * h_i for z_i, h_i in zip(zs, hs))
        return fused, z


class GatedHierarchicalLayer(nn.Module):
    """3-input hierarchical GMU: ``z1*h1 + (1-z1)*z2*h2 + (1-z1)*(1-z2)*h3``
    with two gates (ref: DEMO_GMUs notebook cell 52 ``GMU_3D_hierarchical``)."""

    size_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3) -> Tuple[jax.Array, jax.Array]:
        h1 = jnp.tanh(_dense(self.size_out, "hidden1", self.dtype)(x1))
        h2 = jnp.tanh(_dense(self.size_out, "hidden2", self.dtype)(x2))
        h3 = jnp.tanh(_dense(self.size_out, "hidden3", self.dtype)(x3))
        x_cat = jnp.concatenate([x1, x2, x3], axis=-1)
        z1 = jax.nn.sigmoid(_dense(self.size_out, "x1_gate", self.dtype)(x_cat))
        z2 = jax.nn.sigmoid(_dense(self.size_out, "x2_gate", self.dtype)(x_cat))
        fused = z1 * h1 + (1 - z1) * z2 * h2 + (1 - z1) * (1 - z2) * h3
        gates = jnp.concatenate([z1, (1 - z1) * z2, (1 - z1) * (1 - z2)],
                                axis=-1)
        return fused, gates


class GatedSoftmaxLayer(nn.Module):
    """3-input softmax-normalised GMU (ref: DEMO_GMUs notebook cell 54
    ``GMU_3D_softmax``): per-feature softmax over the three modalities.

    Divergence: the notebook's committed forward stacks ``x1`` three times
    into the gate input (an evident typo); this implements the intended
    per-modality stack (x1, x2, x3).
    """

    size_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3) -> Tuple[jax.Array, jax.Array]:
        h1 = jnp.tanh(_dense(self.size_out, "hidden1", self.dtype)(x1))
        h2 = jnp.tanh(_dense(self.size_out, "hidden2", self.dtype)(x2))
        h3 = jnp.tanh(_dense(self.size_out, "hidden3", self.dtype)(x3))
        xs_t = []
        for i, x in enumerate((x1, x2, x3)):
            if x.shape[-1] != self.size_out:
                x = _dense(self.size_out, f"transform_{i+1}", self.dtype)(x)
            xs_t.append(x)
        gate = _dense(self.size_out, "x1_gate", self.dtype)
        stacked = jnp.stack([gate(x) for x in xs_t], axis=0)
        z = jax.nn.softmax(stacked, axis=0)
        fused = z[0] * h1 + z[1] * h2 + z[2] * h3
        return fused, jnp.concatenate([z[0], z[1], z[2]], axis=-1)
