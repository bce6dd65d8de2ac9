"""Parity tests: bpx MultiheadAttention vs a torch oracle.

The oracle is ``torch.nn.functional.multi_head_attention_forward`` with a
packed in-projection — the same computation the reference's fairseq-derived
module performs (ref: multihead_attention.py:52-135: packed QKV slices,
q-scaling, fp32 softmax, bmm).  Weights are shared via ``load_packed_qkv``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from bpx.ops.attention import MultiheadAttention, load_packed_qkv
from bpx.ops.masks import offset_future_mask


def _make_weights(E, seed=0):
    g = torch.Generator().manual_seed(seed)
    in_w = torch.empty(3 * E, E)
    torch.nn.init.xavier_uniform_(in_w, generator=g)
    in_b = torch.randn(3 * E, generator=g) * 0.02
    out_w = torch.empty(E, E)
    torch.nn.init.xavier_uniform_(out_w, generator=g)
    out_b = torch.randn(E, generator=g) * 0.02
    return in_w, in_b, out_w, out_b


def torch_mha(q_tbe, k_tbe, v_tbe, E, H, weights, attn_mask=None):
    in_w, in_b, out_w, out_b = weights
    out, _ = F.multi_head_attention_forward(
        q_tbe, k_tbe, v_tbe, E, H,
        in_w, in_b, None, None, False, 0.0, out_w, out_b,
        training=False, need_weights=False, attn_mask=attn_mask)
    return out


@pytest.mark.parametrize("tq,tk,mask", [(6, 6, False), (6, 6, True),
                                        (6, 10, True), (10, 6, True)])
def test_mha_matches_torch(tq, tk, mask):
    E, H, B = 32, 4, 3
    rng = np.random.RandomState(1)
    q = rng.randn(B, tq, E).astype(np.float32)
    k = rng.randn(B, tk, E).astype(np.float32)

    weights = _make_weights(E)
    attn_mask = (torch.triu(torch.full((tq, tk), float("-inf")),
                            1 + abs(tk - tq)) if mask else None)
    oracle = torch_mha(torch.tensor(q).transpose(0, 1),
                       torch.tensor(k).transpose(0, 1),
                       torch.tensor(k).transpose(0, 1),
                       E, H, weights, attn_mask)
    oracle = oracle.transpose(0, 1).detach().numpy()

    module = MultiheadAttention(embed_dim=E, num_heads=H)
    params = {"params": load_packed_qkv(*[w.numpy() for w in weights], E)}
    jmask = offset_future_mask(tq, tk) if mask else None
    ours = module.apply(params, jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(k), mask=jmask)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-5)


def test_self_attention_default_args():
    E, H, B, T = 16, 2, 2, 5
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, E).astype(np.float32)
    module = MultiheadAttention(embed_dim=E, num_heads=H)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a = module.apply(params, jnp.asarray(x))
    b = module.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_softmax_fp32_under_bf16():
    """bf16 compute must still softmax in fp32 (ref: multihead_attention.py:121)."""
    E, H, B, T = 32, 4, 2, 8
    rng = np.random.RandomState(2)
    x = (rng.randn(B, T, E) * 4).astype(np.float32)
    m32 = MultiheadAttention(embed_dim=E, num_heads=H, dtype=jnp.float32)
    m16 = MultiheadAttention(embed_dim=E, num_heads=H, dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a = np.asarray(m32.apply(params, jnp.asarray(x)))
    b = np.asarray(m16.apply(params, jnp.asarray(x.astype(np.float32)))
                   .astype(jnp.float32))
    # bf16 activations: no NaN/inf and small relative error overall.
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, f"bf16 relative error too large: {rel}"


def test_attn_dropout_changes_output():
    E, H, B, T = 16, 2, 2, 5
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, E).astype(np.float32))
    module = MultiheadAttention(embed_dim=E, num_heads=H, attn_dropout=0.5)
    params = module.init(jax.random.PRNGKey(0), x)
    det = module.apply(params, x, deterministic=True)
    stoch = module.apply(params, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(det), np.asarray(stoch))
