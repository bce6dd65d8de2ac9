"""Model-level tests for the BPMulT family (ref: mmtr.py:277-866)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.config import BertConfig, ModelConfig, get_preset
from bpx.models import MODELS, get_model


def _tiny_vapt(**kw):
    return ModelConfig(
        model="mmtrvapt", n_classes=5,
        orig_d_l=32, orig_d_v=24, orig_d_a=96, orig_d_p=20,
        hidden_sz=32, num_heads=4, layers=2,
        num_vectors_l=16, num_vectors_a=8, num_vectors_v=8,
        use_audio_encoder=True, use_poster=True,
        bert=BertConfig.tiny(vocab_size=200).__class__(
            vocab_size=200, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64),
        compute_dtype="float32", **kw)


def _tiny_vat(**kw):
    return ModelConfig(
        model="mmtrvat", n_classes=3,
        orig_d_l=32, orig_d_v=11, orig_d_a=7,
        hidden_sz=32, num_heads=4, layers=2,
        num_vectors_l=12, num_vectors_a=12, num_vectors_v=12,
        use_audio_encoder=False, use_poster=False,
        bert=BertConfig(vocab_size=200, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32", **kw)


def _vapt_batch(cfg, B=2, seed=0):
    rng = np.random.RandomState(seed)
    L = 12
    return (jnp.asarray(rng.randint(1, 200, (B, L))),
            jnp.ones((B, L), jnp.int32),
            jnp.zeros((B, L), jnp.int32),
            jnp.asarray(rng.randn(B, 8, cfg.orig_d_v).astype(np.float32)),
            jnp.asarray(rng.randn(B, 576, cfg.orig_d_a).astype(np.float32)),
            jnp.asarray(rng.randn(B, cfg.orig_d_p).astype(np.float32)))


def _vat_batch(cfg, B=2, seed=0):
    rng = np.random.RandomState(seed)
    L = 12
    return (jnp.asarray(rng.randint(1, 200, (B, L))),
            jnp.ones((B, L), jnp.int32),
            jnp.zeros((B, L), jnp.int32),
            jnp.asarray(rng.randn(B, 12, cfg.orig_d_v).astype(np.float32)),
            jnp.asarray(rng.randn(B, 12, cfg.orig_d_a).astype(np.float32)))


def test_registry():
    assert {"mmtrvapt", "mmtrvat"}.issubset(set(MODELS))
    with pytest.raises(KeyError):
        get_model(ModelConfig(model="nope"))


@pytest.mark.parametrize("hybrid", [False, True])
def test_vapt_forward_and_gates(hybrid):
    cfg = _tiny_vapt(hybrid=hybrid)
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    logits = m.apply(variables, *batch)
    assert logits.shape == (2, cfg.n_classes)
    logits2, gates = m.apply(variables, *batch, output_gates=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-6)
    n_final = 5 if hybrid else 4
    assert gates.shape == (2, n_final * cfg.hidden_sz)
    g = np.asarray(gates)
    assert (g >= 0).all() and (g <= 1).all()


@pytest.mark.parametrize("hybrid", [False, True])
def test_vat_forward_and_gates(hybrid):
    cfg = _tiny_vat(hybrid=hybrid)
    m = get_model(cfg)
    batch = _vat_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    logits, gates = m.apply(variables, *batch, output_gates=True)
    assert logits.shape == (2, cfg.n_classes)
    n_final = 4 if hybrid else 3
    assert gates.shape == (2, n_final * cfg.hidden_sz)


def test_forward_is_deterministic():
    cfg = _tiny_vapt()
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    a = m.apply(variables, *batch)
    b = m.apply(variables, *batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_needs_rng_and_changes_output():
    cfg = _tiny_vapt()
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    det = m.apply(variables, *batch)
    s1 = m.apply(variables, *batch, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    s2 = m.apply(variables, *batch, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(det), np.asarray(s1))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_text_padding_is_applied():
    """Shorter text streams are zero-padded to num_vectors_l in-model
    (ref: mmtr.py:464-469)."""
    cfg = _tiny_vapt()
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    out = m.apply(variables, *batch)
    assert np.isfinite(np.asarray(out)).all()


def test_stream_too_long_raises():
    cfg = _tiny_vapt()
    m = get_model(cfg)
    rng = np.random.RandomState(0)
    B, L = 2, 20   # exceeds num_vectors_l=16
    batch = (jnp.asarray(rng.randint(1, 200, (B, L))),
             jnp.ones((B, L), jnp.int32), jnp.zeros((B, L), jnp.int32),
             jnp.asarray(rng.randn(B, 8, cfg.orig_d_v).astype(np.float32)),
             jnp.asarray(rng.randn(B, 576, cfg.orig_d_a).astype(np.float32)),
             jnp.asarray(rng.randn(B, cfg.orig_d_p).astype(np.float32)))
    with pytest.raises(ValueError, match="exceeds"):
        m.init({"params": jax.random.PRNGKey(0)}, *batch)


def test_presets_construct():
    for name in ["moviescope", "mmimdb", "iemocap", "cmu-mosei", "cmu-mosi",
                 "counseling", "stress", "synthetic-tiny"]:
        exp = get_preset(name)
        get_model(exp.model)   # construction only; init is expensive


def test_jit_forward():
    cfg = _tiny_vapt()
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)

    @jax.jit
    def fwd(v, *b):
        return m.apply(v, *b)

    out = fwd(variables, *batch)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(m.apply(variables, *batch)),
                               atol=1e-5)


def test_vat_mag_fusion_forward_and_gates():
    """fusion='mag' substitutes the final GMU on mmtrvat
    (ref: mmtr.py:10,355-358)."""
    import jax
    cfg = _tiny_vat(fusion="mag")
    model = MODELS[cfg.model](cfg)
    batch = _vat_batch(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    assert "mag" in variables["params"] and "gmu" not in variables["params"]
    logits, z = model.apply(variables, *batch, output_gates=True)
    assert logits.shape == (2, cfg.n_classes)
    assert z.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()
    # training mode exercises MAG's internal dropout
    out = model.apply(variables, *batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()


def test_scan_encoders_override_forward():
    """scan_encoders=False unrolls the crossmodal stacks while BERT stays
    scanned; forward runs and the encoder params are per-layer."""
    cfg = _tiny_vapt(scan_layers=True, scan_encoders=False)
    m = get_model(cfg)
    batch = _vapt_batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    p = variables["params"]
    assert "layer0" in p["trans_v_with_a"]          # unrolled encoders
    assert "layers" in p["bert"]                    # scanned BERT
    logits = m.apply(variables, *batch)
    assert logits.shape == (2, cfg.n_classes)
