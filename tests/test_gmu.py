"""Gate-algebra tests for the GMU family (ref: mmtr.py:161-273)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.ops.gmu import (
    GatedBimodalLayer,
    GatedBimodalFusionLayer,
    GatedNModalLayer,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_bimodal_gmu_algebra(rng):
    D = 8
    x1 = rng.randn(3, D).astype(np.float32)
    x2 = rng.randn(3, D).astype(np.float32)
    m = GatedBimodalLayer(size_out=D)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    fused, gates = m.apply(variables, jnp.asarray(x1), jnp.asarray(x2))

    p = variables["params"]
    h1 = np.tanh(x1 @ np.asarray(p["hidden1"]["kernel"]))
    h2 = np.tanh(x2 @ np.asarray(p["hidden2"]["kernel"]))
    z = _sigmoid(np.concatenate([x1, x2], -1) @ np.asarray(p["x_gate"]["kernel"]))
    np.testing.assert_allclose(np.asarray(fused), z * h1 + (1 - z) * h2,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gates),
                               np.concatenate([z, 1 - z], -1), atol=1e-5)


def test_fusion_gmu_multiplies_raw_input(rng):
    """Fusion-GMU: z*h1*x1 + (1-z)*h2*x2 (ref: mmtr.py:195)."""
    D = 8
    x1 = rng.randn(2, 5, D).astype(np.float32)
    x2 = rng.randn(2, 5, D).astype(np.float32)
    m = GatedBimodalFusionLayer(size_out=D)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    fused, _ = m.apply(variables, jnp.asarray(x1), jnp.asarray(x2))

    p = variables["params"]
    h1 = np.tanh(x1 @ np.asarray(p["hidden1"]["kernel"]))
    h2 = np.tanh(x2 @ np.asarray(p["hidden2"]["kernel"]))
    z = _sigmoid(np.concatenate([x1, x2], -1) @ np.asarray(p["x_gate"]["kernel"]))
    np.testing.assert_allclose(np.asarray(fused),
                               z * h1 * x1 + (1 - z) * h2 * x2, atol=1e-5)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_n_modal_gmu(rng, n):
    """N-ary GMU: sum_i sigmoid(Wg_i [xs]) * tanh(W_i x_i); gates from the
    full concat.  The fused single gate GEMM must equal per-input gates."""
    D = 6
    xs = [rng.randn(4, D).astype(np.float32) for _ in range(n)]
    m = GatedNModalLayer(n_inputs=n, size_out=D)
    jxs = [jnp.asarray(x) for x in xs]
    variables = m.init(jax.random.PRNGKey(0), jxs)
    fused, gates = m.apply(variables, jxs)

    p = variables["params"]
    cat = np.concatenate(xs, -1)
    big_gate = np.asarray(p["x_gates"]["kernel"])  # (n*D_in, n*D)
    z_all = _sigmoid(cat @ big_gate)
    zs = np.split(z_all, n, axis=-1)
    hs = [np.tanh(xs[i] @ np.asarray(p[f"hidden{i+1}"]["kernel"]))
          for i in range(n)]
    expect = sum(z * h for z, h in zip(zs, hs))
    np.testing.assert_allclose(np.asarray(fused), expect, atol=1e-5)
    assert gates.shape == (4, n * D)
    np.testing.assert_allclose(np.asarray(gates), z_all, atol=1e-5)


def test_gates_in_unit_interval(rng):
    xs = [rng.randn(2, 4).astype(np.float32) * 10 for _ in range(3)]
    m = GatedNModalLayer(n_inputs=3, size_out=4)
    jxs = [jnp.asarray(x) for x in xs]
    variables = m.init(jax.random.PRNGKey(0), jxs)
    _, gates = m.apply(variables, jxs)
    g = np.asarray(gates)
    assert (g >= 0).all() and (g <= 1).all()
