"""Pallas LayerNorm vs flax/torch oracles (fwd + grads, both row-tiled
kernel and XLA fallback paths)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bpx.ops.norm import LayerNorm, layer_norm


def _torch_ln(x, scale, bias, eps):
    t = torch.nn.functional.layer_norm(
        torch.tensor(np.asarray(x, np.float32)), (x.shape[-1],),
        torch.tensor(np.asarray(scale)), torch.tensor(np.asarray(bias)), eps)
    return t.numpy()


@pytest.mark.parametrize("force", [False, True])
@pytest.mark.parametrize("shape,eps", [((4, 64, 96), 1e-6),
                                       ((2, 128, 300), 1e-12),
                                       ((512, 768), 1e-12)])
def test_layer_norm_matches_torch(monkeypatch, force, shape, eps, rng):
    if force:
        monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    x = rng.randn(*shape).astype(np.float32)
    scale = rng.rand(shape[-1]).astype(np.float32) + 0.5
    bias = rng.randn(shape[-1]).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                     eps)
    np.testing.assert_allclose(np.asarray(got), _torch_ln(x, scale, bias, eps),
                               atol=2e-5, rtol=2e-5)


def test_layer_norm_grads_match_oracle(monkeypatch, rng):
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    N, E = 64, 96
    x = jnp.asarray(rng.randn(N, E).astype(np.float32))
    scale = jnp.asarray(rng.rand(E).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(E).astype(np.float32))
    w = jnp.asarray(rng.randn(N, E).astype(np.float32))

    def loss_pallas(x, s, b):
        return jnp.sum(layer_norm(x, s, b, 1e-6) * w)

    def loss_ref(x, s, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * s + b
        return jnp.sum(y * w)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-5)


def test_layer_norm_module_param_tree():
    """Same param names as nn.LayerNorm -> checkpoints stay compatible."""
    m = LayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    assert set(v["params"].keys()) == {"scale", "bias"}


def test_layer_norm_odd_rows_fallback(monkeypatch, rng):
    """Row counts with no aligned tile fall back to the XLA formula."""
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    x = rng.randn(3, 7, 33).astype(np.float32)   # N=21: no divisor of 8
    s = np.ones(33, np.float32)
    b = np.zeros(33, np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 1e-6)
    np.testing.assert_allclose(np.asarray(got), _torch_ln(x, s, b, 1e-6),
                               atol=2e-5, rtol=2e-5)


def test_layer_norm_bf16_io(monkeypatch, rng):
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    x = rng.randn(16, 128).astype(np.float32)
    s = rng.rand(128).astype(np.float32) + 0.5
    b = rng.randn(128).astype(np.float32)
    got = layer_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(s),
                     jnp.asarray(b), 1e-6)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               _torch_ln(x, s, b, 1e-6), atol=3e-2)
