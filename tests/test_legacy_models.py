"""Tests for the notebook-era model family (SURVEY.md C30), RAdam, MAG and
the extra GMU variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.config import BertConfig, ModelConfig
from bpx.models import MODELS, get_model


def _cfg(**kw):
    base = dict(
        model="mmtrvpa", n_classes=4,
        orig_d_l=32, orig_d_v=24, orig_d_a=96,
        hidden_sz=32, num_heads=4, layers=1,
        num_vectors_l=16, num_vectors_a=8, num_vectors_v=8,
        use_audio_encoder=True, use_poster=False,
        bert=BertConfig(vocab_size=200, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def _batch(cfg, B=2):
    rng = np.random.RandomState(0)
    L = 10
    return (jnp.asarray(rng.randint(1, 200, (B, L))),
            jnp.ones((B, L), jnp.int32),
            jnp.zeros((B, L), jnp.int32),
            jnp.asarray(rng.randn(B, 8, cfg.orig_d_v).astype(np.float32)),
            jnp.asarray(rng.randn(B, 576, cfg.orig_d_a).astype(np.float32)))


def test_registry_has_legacy_models():
    for name in ["mmtrvpa", "tmmtrvpa", "gmu", "gmu_bi",
                 "gmu_hier", "gmu_softmax"]:
        assert name in MODELS


@pytest.mark.parametrize("name", ["gmu_hier", "gmu_softmax"])
def test_gmu_variant_registry_forward(name):
    """The notebook GMU variants are selectable end-to-end via the registry
    (DEMO_GMUs cells 52/54; side-by-side runs cells 72-77)."""
    cfg = _cfg(model=name)
    m = get_model(cfg)
    assert m.gmu_variant == {"gmu_hier": "hierarchical",
                             "gmu_softmax": "softmax"}[name]
    batch = _batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    logits = m.apply(variables, *batch)
    assert logits.shape == (2, cfg.n_classes)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["mmtrvpa", "tmmtrvpa", "gmu"])
def test_legacy_trimodal_forward(name):
    cfg = _cfg(model=name)
    m = get_model(cfg)
    batch = _batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    logits, gates = m.apply(variables, *batch, output_gates=True)
    assert logits.shape == (2, cfg.n_classes)
    assert np.isfinite(np.asarray(logits)).all()
    assert gates.shape[0] == 2


def test_gmu_bimodal_forward():
    cfg = _cfg(model="gmu_bi")
    m = get_model(cfg)
    txt, mask, seg, video, _ = _batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, txt, mask, seg,
                       video)
    logits = m.apply(variables, txt, mask, seg, video)
    assert logits.shape == (2, cfg.n_classes)


@pytest.mark.parametrize("variant", ["hierarchical", "softmax"])
def test_gmu_variants(variant):
    from bpx.models.legacy import GMUClf
    cfg = _cfg(model="gmu")
    m = GMUClf(config=cfg, gmu_variant=variant)
    batch = _batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, *batch)
    logits, gates = m.apply(variables, *batch, output_gates=True)
    assert np.isfinite(np.asarray(logits)).all()
    g = np.asarray(gates).reshape(2, 3, cfg.hidden_sz)
    # both variants produce convex gate combinations summing to 1
    np.testing.assert_allclose(g.sum(1), 1.0, atol=1e-5)


def test_hierarchical_gmu_gates_convex(rng):
    from bpx.ops.gmu import GatedHierarchicalLayer
    xs = [jnp.asarray(rng.randn(3, 8).astype(np.float32)) for _ in range(3)]
    m = GatedHierarchicalLayer(size_out=8)
    variables = m.init(jax.random.PRNGKey(0), *xs)
    _, gates = m.apply(variables, *xs)
    g = np.asarray(gates).reshape(3, 3, 8)
    np.testing.assert_allclose(g.sum(1), 1.0, atol=1e-6)


def test_mag_module(rng):
    from bpx.ops.mag import MAG
    t = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    a = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    m = MAG(hidden_size=16)
    variables = m.init(jax.random.PRNGKey(0), t, v, a)
    out = m.apply(variables, t, v, a)
    assert out.shape == t.shape
    assert np.isfinite(np.asarray(out)).all()


def test_radam_trains_quadratic():
    """RAdam must minimise a simple quadratic; first steps take the
    degenerated-SGD branch (N_sma <= 4), later the rectified-adaptive one."""
    import optax
    from bpx.train.radam import plain_radam, radam

    for opt in [radam(0.1), plain_radam(0.1)]:
        params = {"w": jnp.asarray([3.0, -2.0])}
        state = opt.init(params)
        loss = lambda p: jnp.sum(p["w"] ** 2)
        for _ in range(200):
            g = jax.grad(loss)(params)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss(params)) < 1e-2


def test_bertclf_registry_forward():
    """Text-only BERT baseline (notebook 1 cell 36 BertClf / cell 54 name
    "bert") — the comparison tables' anchor row: pooler -> Dense."""
    for name in ("bertclf", "bert"):
        assert name in MODELS
    cfg = _cfg(model="bertclf")
    m = get_model(cfg)
    txt, mask, seg, *_ = _batch(cfg)
    variables = m.init({"params": jax.random.PRNGKey(0)}, txt, mask, seg)
    logits = m.apply(variables, txt, mask, seg)
    assert logits.shape == (2, cfg.n_classes)
    assert np.isfinite(np.asarray(logits)).all()

    # it really is pooler -> single Dense (the notebook graph)
    from bpx.ops.bert import BertEncoder
    bert = BertEncoder(cfg.bert, dtype=jnp.float32, with_pooler=True)
    _, pooled = bert.apply({"params": variables["params"]["bert"]},
                           txt, mask, seg)
    p = variables["params"]["clf"]
    expect = pooled @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    # no gates: the interpretability channel stays shape-stable at width 0
    logits2, gates = m.apply(variables, txt, mask, seg, output_gates=True)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               rtol=1e-6, atol=1e-6)
    assert gates.shape == (2, 0)
