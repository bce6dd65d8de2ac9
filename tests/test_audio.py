"""Audio encoder parity vs torch Conv1d/AdaptiveAvgPool1d
(ref: mmtr.py:93-141)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from bpx.ops.audio import (
    AudioEncoder,
    adaptive_avg_pool1d,
    make_audio_encoder,
)


@pytest.mark.parametrize("t_in,t_out", [(137, 200), (400, 200), (64, 64),
                                        (7, 3), (10, 20)])
def test_adaptive_pool_matches_torch(t_in, t_out):
    x = np.random.RandomState(0).randn(2, t_in, 4).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), t_out))
    # torch pools over the last axis on (B, C, T)
    oracle = torch.nn.AdaptiveAvgPool1d(t_out)(
        torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_audio_encoder_matches_torch_conv():
    """Conv1d(96,96,k=128,s=2) x2 + pool(200) on a (B, T, 96) stream."""
    C, K, S, T, B, POOL = 8, 16, 2, 200, 2, 20
    x = np.random.RandomState(1).randn(B, T, C).astype(np.float32)

    enc = AudioEncoder(channels=C, kernel_size=K, stride=S, pool_target=POOL)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(enc.apply(variables, jnp.asarray(x)))

    # torch oracle with copied weights; flax Conv kernel is (K, Cin, Cout),
    # torch Conv1d weight is (Cout, Cin, K).
    conv1 = torch.nn.Conv1d(C, C, K, stride=S)
    conv2 = torch.nn.Conv1d(C, C, K, stride=S)
    p = variables["params"]
    with torch.no_grad():
        for conv, name in [(conv1, "conv1"), (conv2, "conv2")]:
            kern = np.asarray(p[name]["kernel"])          # (K, Cin, Cout)
            conv.weight.copy_(torch.tensor(kern.transpose(2, 1, 0)))
            conv.bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))
        y = torch.tensor(x).transpose(1, 2)               # (B, C, T)
        y = conv2(conv1(y))
        y = torch.nn.AdaptiveAvgPool1d(POOL)(y).transpose(1, 2)
    np.testing.assert_allclose(ours, y.numpy(), atol=1e-4)
    assert ours.shape == (B, POOL, C)


def test_factory_variants():
    # lengths satisfy the two-conv minimum for each kernel/stride
    for variant, ch, t in [("moviescope", 96, 512), ("cmumosei", 74, 64),
                           ("cmumosi", 5, 64)]:
        enc = make_audio_encoder(variant, ch, 16)
        x = jnp.zeros((1, t, ch))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (1, 16, ch)


def test_too_short_audio_raises():
    enc = make_audio_encoder("moviescope", 96, 16)
    with pytest.raises(ValueError, match="too short"):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 96)))
