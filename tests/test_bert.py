"""Parity: native Flax BERT vs HF torch BertModel with shared weights.

The reference's text encoder is HF ``BertModel`` (ref: mmtr.py:144-158); this
test instantiates a small random HF torch BertModel locally (no download),
imports its state_dict via ``load_hf_bert_params`` and checks last-hidden
state parity, padding handling included.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from bpx.config import BertConfig
from bpx.ops.bert import BertEncoder, load_hf_bert_params


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import BertConfig as HFBertConfig, BertModel

    cfg = BertConfig(vocab_size=500, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    return cfg, hf


def test_bert_matches_hf(hf_pair):
    cfg, hf = hf_pair
    params = load_hf_bert_params(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, T = 3, 17
    ids = rng.randint(0, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), dtype=np.int64)
    mask[0, 10:] = 0
    mask[2, 5:] = 0
    seg = np.zeros((B, T), dtype=np.int64)

    with torch.no_grad():
        oracle = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    token_type_ids=torch.tensor(seg)
                    ).last_hidden_state.numpy()

    enc = BertEncoder(cfg)
    ours = enc.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=3e-5)


def test_bert_random_init_runs():
    cfg = BertConfig.tiny()
    enc = BertEncoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(variables, ids, mask)
    assert out.shape == (2, 8, cfg.hidden_size)
    # dropout path
    out2 = enc.apply(variables, ids, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == out.shape


def test_gelu_config_selects_form():
    """``BertConfig.gelu`` plumbs through to the FFN activation: tanh vs erf
    outputs differ (the knob is live) but only by the approximation error
    (~1e-3 in activations — the documented perf divergence, PARITY.md)."""
    import dataclasses
    cfg = BertConfig.tiny()
    assert cfg.gelu == "erf"            # default = exact HF numerics
    enc_erf = BertEncoder(cfg)
    enc_tanh = BertEncoder(dataclasses.replace(cfg, gelu="tanh"))
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    variables = enc_erf.init(jax.random.PRNGKey(0), ids, mask)
    a = np.asarray(enc_erf.apply(variables, ids, mask))
    b = np.asarray(enc_tanh.apply(variables, ids, mask))
    assert not np.array_equal(a, b)
    np.testing.assert_allclose(a, b, atol=5e-2)
    # the perf presets opt into the tanh form
    from bpx.config import get_preset
    assert get_preset("moviescope").model.bert.gelu == "tanh"
    assert get_preset("stress").model.bert.gelu == "tanh"


def test_distil_config_runs():
    """DistilBERT-style variant: no token-type embeddings
    (ref CLI choice distilbert-base-uncased, train.py:34)."""
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64, use_token_type=False)
    enc = BertEncoder(cfg)
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    assert "token_type_embeddings" not in variables["params"]
    out = enc.apply(variables, ids, mask)
    assert out.shape == (2, 6, 32)


def test_distilbert_import_matches_hf():
    """DistilBERT checkpoint layout (``transformer.layer.*``) imports and
    matches HF DistilBertModel (ref CLI choice, train.py:34; the reference's
    own ``BertModel.from_pretrained('distilbert-base-uncased')`` cannot load
    these weights at all — divergence documented: we actually can)."""
    from transformers import DistilBertConfig as HFCfg, DistilBertModel

    cfg = BertConfig(vocab_size=500, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=64, use_token_type=False)
    hf_cfg = HFCfg(vocab_size=cfg.vocab_size, dim=cfg.hidden_size,
                   n_layers=cfg.num_layers, n_heads=cfg.num_heads,
                   hidden_dim=cfg.intermediate_size,
                   max_position_embeddings=cfg.max_position_embeddings,
                   dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(1)
    hf = DistilBertModel(hf_cfg).eval()
    params = load_hf_bert_params(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, T = 3, 17
    ids = rng.randint(0, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), dtype=np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        oracle = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    ours = BertEncoder(cfg).apply({"params": params}, jnp.asarray(ids),
                                  jnp.asarray(mask))
    # HF masks padded rows out of attention only; compare valid positions
    np.testing.assert_allclose(np.asarray(ours)[mask.astype(bool)],
                               oracle[mask.astype(bool)], atol=3e-5)


def test_bert_pallas_path_matches_xla(monkeypatch):
    """Flash path (kv_lens, interpret-mode kernel) == einsum path at eval."""
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    cfg = BertConfig.tiny()
    B, T = 2, 128
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)), jnp.int32)
    # right-padded masks with different lengths per sample
    lens = np.array([50, 128])
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.int32))

    xla = BertEncoder(cfg, attention_impl="xla")
    pal = BertEncoder(cfg, attention_impl="pallas")
    params = xla.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out_x = xla.apply({"params": params}, ids, mask)
    out_p = pal.apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5, rtol=2e-5)


def test_bert_pallas_dropout_trains(monkeypatch):
    """Flash path with in-kernel dropout: finite grads, seedwise determinism."""
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    cfg = BertConfig.tiny()
    B, T = 2, 128
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    model = BertEncoder(cfg, attention_impl="pallas")
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

    # Mask-sensitive statistic: project the output with fixed random weights.
    # (sum(out**2) of a LayerNorm output is ~B*T*H for ANY dropout mask at an
    # init of scale=1/bias=0, so it cannot distinguish masks — it made this
    # test pass only on last-ulp rounding noise, and fail on the TPU backend.)
    W = jnp.asarray(np.random.RandomState(7).randn(cfg.hidden_size, 4),
                    jnp.float32)

    def fwd(p, key):
        return model.apply({"params": p}, ids, mask, deterministic=False,
                           rngs={"dropout": key})

    def loss(p, key):
        return jnp.sum((fwd(p, key) @ W) ** 2)

    key = jax.random.PRNGKey(3)
    l1, g = jax.value_and_grad(loss)(params, key)
    l2 = loss(params, key)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)          # same rng -> same dropout
    # different rng -> different mask: compare outputs elementwise, which is
    # sensitive to the mask regardless of downstream statistics
    o3 = np.asarray(fwd(params, jax.random.PRNGKey(3)))
    o4 = np.asarray(fwd(params, jax.random.PRNGKey(4)))
    assert np.abs(o3 - o4).max() > 1e-3
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_bert_remat_policy_save_attn_grads_match_full(monkeypatch):
    """remat_policy="save_attn" on the BERT stack (opt-in under
    micro-batching, config.remat_policy_bert) only changes backward
    scheduling — grads must match full-recompute remat exactly."""
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    cfg = BertConfig.tiny()
    B, T = 2, 64
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    def build(policy):
        return BertEncoder(cfg, attention_impl="pallas", scan_layers=True,
                           remat=True, remat_policy=policy)

    m0, m1 = build(None), build("save_attn")
    params = m0.init(jax.random.PRNGKey(0), ids, mask)
    W = jnp.asarray(np.random.RandomState(7).randn(cfg.hidden_size, 4),
                    jnp.float32)

    def loss(m, p):
        return jnp.sum((m.apply(p, ids, mask) @ W) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
