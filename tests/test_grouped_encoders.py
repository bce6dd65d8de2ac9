"""Grouped-encoder equivalence: the vmapped same-shape encoder pairs must be
a pure layout transform — identical logits to the ungrouped model given the
correspondingly stacked weights (PERF.md roadmap item 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.config import BertConfig, ModelConfig
from bpx.models import get_model

GROUPS = {
    "g_va": ("trans_v_with_a", "trans_a_with_v"),
    "g_xl": ("trans_v_with_l", "trans_a_with_l"),
    "g_lx": ("trans_l_with_v", "trans_l_with_a"),
    "g_l_bi": ("trans_l_with_v2a", "trans_l_with_a2v"),
    "g_x2l": ("trans_a_with_v2l", "trans_v_with_a2l"),
    "g_xl2": ("trans_a_with_l2v", "trans_v_with_l2a"),
}


def _cfg(model="mmtrvapt", grouped=False):
    return ModelConfig(
        model=model, n_classes=4,
        orig_d_l=32, orig_d_v=24, orig_d_a=96, orig_d_p=20,
        hidden_sz=32, num_heads=4, layers=2,
        num_vectors_l=16, num_vectors_a=8, num_vectors_v=8,
        use_audio_encoder=True, use_poster=True, attn_mask=True,
        bert=BertConfig(vocab_size=200, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32", group_encoders=grouped)


def _batch(cfg, B=2):
    rng = np.random.RandomState(0)
    L = 10
    return (jnp.asarray(rng.randint(1, 200, (B, L))),
            jnp.ones((B, L), jnp.int32),
            jnp.zeros((B, L), jnp.int32),
            jnp.asarray(rng.randn(B, 8, cfg.orig_d_v).astype(np.float32)),
            jnp.asarray(rng.randn(B, 576, cfg.orig_d_a).astype(np.float32)),
            jnp.asarray(rng.randn(B, cfg.orig_d_p).astype(np.float32)))


def _regroup(params):
    """Stack the 12 ungrouped encoder subtrees into the 6 grouped slots."""
    grouped = {k: v for k, v in params.items()
               if k not in {n for pair in GROUPS.values() for n in pair}}
    for gname, (a, b) in GROUPS.items():
        grouped[gname] = jax.tree.map(lambda x, y: jnp.stack([x, y]),
                                      params[a], params[b])
    return grouped


@pytest.mark.slow
def test_grouped_matches_ungrouped_vapt():
    cfg_u = _cfg(grouped=False)
    cfg_g = _cfg(grouped=True)
    model_u = get_model(cfg_u)
    model_g = get_model(cfg_g)
    batch = _batch(cfg_u)
    vu = model_u.init({"params": jax.random.PRNGKey(0)}, *batch)
    ours_u = np.asarray(model_u.apply(vu, *batch))

    grouped_params = _regroup(dict(vu["params"]))
    ours_g = np.asarray(model_g.apply({"params": grouped_params}, *batch))
    np.testing.assert_allclose(ours_g, ours_u, atol=2e-5, rtol=1e-4)


def test_grouped_requires_uniform_dropouts():
    cfg = _cfg(grouped=True).replace(attn_dropout_a=0.1, attn_dropout_v=0.0)
    model = get_model(cfg)
    batch = _batch(cfg)
    with pytest.raises(AssertionError, match="attn_dropout"):
        model.init({"params": jax.random.PRNGKey(0)}, *batch)
