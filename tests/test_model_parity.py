"""End-to-end logit parity: BPMulTVAPT vs a torch oracle of the full graph.

The oracle reimplements the reference dataflow (mmtr.py:444-583) in torch
from the documented math — projections, static padding, the 12
crossmodal/biprojection encoders (via the layer oracle from
test_encoder), sequence-axis adapters, middle/top Fusion-GMUs with the
level-1->2/1->3 residuals and target-L argument flip, first+last-token
summaries, the final 4-ary GMU and the residual MLP head — with weights
copied from the flax params.  BERT parity is covered separately
(test_bert.py); here the oracle consumes the same BERT output our model
produces, isolating the multimodal graph.

This is the SURVEY.md §7.3 "bitwise-tolerant logit parity" evidence.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from bpx.config import BertConfig, ModelConfig
from bpx.models import get_model
from bpx.ops.bert import BertEncoder
from bpx.ops.positions import positional_embedding
from tests.test_encoder import TorchOracleLayer, _t


E, H, LAYERS = 32, 4, 2
NV_L, NV_A, NV_V = 16, 8, 8


def _cfg():
    return ModelConfig(
        model="mmtrvapt", n_classes=5,
        orig_d_l=E, orig_d_v=24, orig_d_a=96, orig_d_p=20,
        hidden_sz=E, num_heads=H, layers=LAYERS,
        num_vectors_l=NV_L, num_vectors_a=NV_A, num_vectors_v=NV_V,
        use_audio_encoder=True, use_poster=True, attn_mask=True,
        bert=BertConfig(vocab_size=200, hidden_size=E, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32")


class OracleEncoder:
    """Torch oracle of bpx TransformerEncoder (scale + channel-0 positions +
    layer stack + final LN) built from flax params."""

    def __init__(self, params, biprojection):
        self.layers = []
        i = 0
        while f"layer{i}" in params:
            self.layers.append(TorchOracleLayer(params[f"layer{i}"], E, H,
                                                biprojection))
            i += 1
        self.fw = _t(params["final_norm"]["scale"])
        self.fb = _t(params["final_norm"]["bias"])

    @staticmethod
    def embed(x_np):
        scaled = math.sqrt(E) * x_np
        pe = np.asarray(positional_embedding(
            jnp.asarray(x_np.astype(np.float32))))
        return _t(scaled + pe)

    def __call__(self, x, xk=None, attn_mask=True):
        h = self.embed(x)
        hk = self.embed(xk) if xk is not None else None
        for layer in self.layers:
            h = layer.forward(h, hk, hk, attn_mask=attn_mask)
        return F.layer_norm(h, (E,), self.fw, self.fb)


def _gmu_feat(params, x1, x2):
    """Fusion-GMU oracle (ref: mmtr.py:189-195)."""
    h1 = torch.tanh(x1 @ _t(params["hidden1"]["kernel"]))
    h2 = torch.tanh(x2 @ _t(params["hidden2"]["kernel"]))
    z = torch.sigmoid(torch.cat([x1, x2], -1) @ _t(params["x_gate"]["kernel"]))
    return z * h1 * x1 + (1 - z) * h2 * x2


def _gmu_n(params, xs):
    """N-ary GMU oracle with the fused gate kernel layout."""
    n = len(xs)
    hs = [torch.tanh(x @ _t(params[f"hidden{i+1}"]["kernel"]))
          for i, x in enumerate(xs)]
    zall = torch.sigmoid(torch.cat(xs, -1) @ _t(params["x_gates"]["kernel"]))
    zs = zall.chunk(n, dim=-1)
    return sum(z * h for z, h in zip(zs, hs))


def _seq_adapter(params, x):
    """(B, T_in, E) -> (B, T_out, E) oracle (ref: mmtr.py:380-383)."""
    w = _t(params["kernel"])          # (T_out, T_in)
    b = _t(params["bias"])
    return torch.einsum("ut,bte->bue", w, x) + b[None, :, None]


def _audio_oracle(params, audio_np, pool_target):
    """Conv1d x2 + adaptive pool oracle."""
    x = torch.tensor(audio_np).transpose(1, 2)     # (B, C, T)
    for name in ["conv1", "conv2"]:
        kern = np.asarray(params[name]["kernel"])   # (K, Cin, Cout)
        w = torch.tensor(kern.transpose(2, 1, 0))
        b = torch.tensor(np.asarray(params[name]["bias"]))
        x = F.conv1d(x, w, b, stride=2)
    x = torch.nn.AdaptiveAvgPool1d(pool_target)(x)
    return x.transpose(1, 2)                        # (B, T, C)


def _pad_t(x, length):
    return F.pad(x, (0, 0, 0, length - x.shape[1]))


def test_vapt_logits_match_torch_oracle():
    cfg = _cfg()
    model = get_model(cfg)
    rng = np.random.RandomState(0)
    B, L = 2, 10
    txt = rng.randint(1, 200, (B, L))
    mask = np.ones((B, L), np.int32)
    seg = np.zeros((B, L), np.int32)
    video = rng.randn(B, 8, cfg.orig_d_v).astype(np.float32)
    audio = rng.randn(B, 576, cfg.orig_d_a).astype(np.float32)
    poster = rng.randn(B, cfg.orig_d_p).astype(np.float32)

    batch = tuple(jnp.asarray(a) for a in
                  (txt, mask, seg, video, audio, poster))
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    ours = np.asarray(model.apply(variables, *batch))
    p = variables["params"]

    # --- oracle ---------------------------------------------------------
    # BERT output comes from the same flax module (parity proven separately)
    bert = BertEncoder(cfg.bert)
    x_l = np.asarray(bert.apply({"params": p["bert"]}, batch[0], batch[1],
                                batch[2]))
    x_l_t = torch.tensor(x_l)                                   # no proj: E==orig_d_l
    x_a_t = _audio_oracle(p["audio_enc"], audio, NV_A) \
        @ _t(p["proj_a"]["kernel"])
    x_v_t = torch.tensor(video) @ _t(p["proj_v"]["kernel"])

    proj_l = _pad_t(x_l_t, NV_L)
    proj_a = _pad_t(x_a_t, NV_A)
    proj_v = _pad_t(x_v_t, NV_V)
    poster_h = torch.tensor(poster) @ _t(p["proj_poster"]["kernel"])

    enc = lambda name, bip=False: OracleEncoder(p[name], bip)
    h_v_with_as = enc("trans_v_with_a")(np.asarray(proj_v), np.asarray(proj_a))
    h_a_with_vs = enc("trans_a_with_v")(np.asarray(proj_a), np.asarray(proj_v))
    h_v_with_ls = enc("trans_v_with_l")(np.asarray(proj_v), np.asarray(proj_l))
    h_l_with_vs = enc("trans_l_with_v")(np.asarray(proj_l), np.asarray(proj_v))
    h_a_with_ls = enc("trans_a_with_l")(np.asarray(proj_a), np.asarray(proj_l))
    h_l_with_as = enc("trans_l_with_a")(np.asarray(proj_l), np.asarray(proj_a))

    # target L (flip order, ref: mmtr.py:503-522)
    h_l_v2a = enc("trans_l_with_v2a", True)(np.asarray(proj_l),
                                            h_a_with_vs.detach().numpy())
    h_l_a2v = enc("trans_l_with_a2v", True)(np.asarray(proj_l),
                                            h_v_with_as.detach().numpy())
    t_a = _seq_adapter(p["transfm_a2l"], h_a_with_vs)
    t_v = _seq_adapter(p["transfm_v2l"], h_v_with_as)
    mid_l = _gmu_feat(p["gmu_l_m"], t_v, t_a)
    top_l = _gmu_feat(p["gmu_l"], h_l_a2v + t_v, h_l_v2a + t_a) + mid_l
    last_l = top_l[:, 0] + top_l[:, -1]

    # target A (direct order, ref: mmtr.py:526-545)
    h_a_v2l = enc("trans_a_with_v2l", True)(np.asarray(proj_a),
                                            h_l_with_vs.detach().numpy())
    h_a_l2v = enc("trans_a_with_l2v", True)(np.asarray(proj_a),
                                            h_v_with_ls.detach().numpy())
    t_l = _seq_adapter(p["transfm_l2a"], h_l_with_vs)
    mid_a = _gmu_feat(p["gmu_a_m"], t_l, h_v_with_ls)
    top_a = _gmu_feat(p["gmu_a"], h_a_v2l + t_l, h_a_l2v + h_v_with_ls) + mid_a
    last_a = top_a[:, 0] + top_a[:, -1]

    # target V (ref: mmtr.py:549-568)
    h_v_a2l = enc("trans_v_with_a2l", True)(np.asarray(proj_v),
                                            h_l_with_as.detach().numpy())
    h_v_l2a = enc("trans_v_with_l2a", True)(np.asarray(proj_v),
                                            h_a_with_ls.detach().numpy())
    t_l2 = _seq_adapter(p["transfm_l2v"], h_l_with_as)
    mid_v = _gmu_feat(p["gmu_v_m"], t_l2, h_a_with_ls)
    top_v = _gmu_feat(p["gmu_v"], h_v_a2l + t_l2, h_v_l2a + h_a_with_ls) + mid_v
    last_v = top_v[:, 0] + top_v[:, -1]

    fused = _gmu_n(p["gmu"], [last_l, last_v, last_a, poster_h])
    hproj = F.relu(fused @ _t(p["proj1"]["kernel"]) + _t(p["proj1"]["bias"]))
    hproj = hproj @ _t(p["proj2"]["kernel"]) + _t(p["proj2"]["bias"])
    logits = (hproj + fused) @ _t(p["out_layer"]["kernel"]) \
        + _t(p["out_layer"]["bias"])

    np.testing.assert_allclose(ours, logits.detach().numpy(),
                               atol=5e-4, rtol=1e-3)


def test_vat_logits_match_torch_oracle():
    """3-input model parity (ref: mmtr.py:735-866): raw audio, identity
    length adapters, plain second-round encoders, 3-ary final GMU."""
    cfg = ModelConfig(
        model="mmtrvat", n_classes=3,
        orig_d_l=E, orig_d_v=11, orig_d_a=7,
        hidden_sz=E, num_heads=H, layers=1,
        num_vectors_l=12, num_vectors_a=12, num_vectors_v=12,
        use_audio_encoder=False, use_poster=False, attn_mask=True,
        bert=BertConfig(vocab_size=200, hidden_size=E, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32")
    from bpx.models import get_model as _gm
    model = _gm(cfg)
    rng = np.random.RandomState(1)
    B, L = 2, 12
    txt = rng.randint(1, 200, (B, L))
    mask = np.ones((B, L), np.int32)
    seg = np.zeros((B, L), np.int32)
    video = rng.randn(B, 12, cfg.orig_d_v).astype(np.float32)
    audio = rng.randn(B, 12, cfg.orig_d_a).astype(np.float32)

    batch = tuple(jnp.asarray(a) for a in (txt, mask, seg, video, audio))
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    ours = np.asarray(model.apply(variables, *batch))
    p = variables["params"]

    bert = BertEncoder(cfg.bert)
    x_l = torch.tensor(np.asarray(bert.apply(
        {"params": p["bert"]}, batch[0], batch[1], batch[2])))
    x_v = torch.tensor(video) @ _t(p["proj_v"]["kernel"])
    x_a = torch.tensor(audio) @ _t(p["proj_a"]["kernel"])
    proj_l, proj_v, proj_a = x_l, x_v, x_a   # lengths already 12 == nv

    enc = lambda name: OracleEncoder(p[name], False)   # all plain in VAT
    h_v_as = enc("trans_v_with_a")(np.asarray(proj_v.detach()), np.asarray(proj_a.detach()))
    h_a_vs = enc("trans_a_with_v")(np.asarray(proj_a.detach()), np.asarray(proj_v.detach()))
    h_v_ls = enc("trans_v_with_l")(np.asarray(proj_v.detach()), np.asarray(proj_l.detach()))
    h_l_vs = enc("trans_l_with_v")(np.asarray(proj_l.detach()), np.asarray(proj_v.detach()))
    h_a_ls = enc("trans_a_with_l")(np.asarray(proj_a.detach()), np.asarray(proj_l.detach()))
    h_l_as = enc("trans_l_with_a")(np.asarray(proj_l.detach()), np.asarray(proj_a.detach()))

    def second(name, q, kv):
        return enc(name)(np.asarray(q.detach()), np.asarray(kv.detach()))

    # L (flip), identity adapters
    bi1 = second("trans_l_with_v2a", proj_l, h_a_vs)
    bi2 = second("trans_l_with_a2v", proj_l, h_v_as)
    mid = _gmu_feat(p["gmu_l_m"], h_v_as, h_a_vs)
    top = _gmu_feat(p["gmu_l"], bi2 + h_v_as, bi1 + h_a_vs) + mid
    last_l = top[:, 0] + top[:, -1]
    # A (direct)
    bi1 = second("trans_a_with_v2l", proj_a, h_l_vs)
    bi2 = second("trans_a_with_l2v", proj_a, h_v_ls)
    mid = _gmu_feat(p["gmu_a_m"], h_l_vs, h_v_ls)
    top = _gmu_feat(p["gmu_a"], bi1 + h_l_vs, bi2 + h_v_ls) + mid
    last_a = top[:, 0] + top[:, -1]
    # V (direct)
    bi1 = second("trans_v_with_a2l", proj_v, h_l_as)
    bi2 = second("trans_v_with_l2a", proj_v, h_a_ls)
    mid = _gmu_feat(p["gmu_v_m"], h_l_as, h_a_ls)
    top = _gmu_feat(p["gmu_v"], bi1 + h_l_as, bi2 + h_a_ls) + mid
    last_v = top[:, 0] + top[:, -1]

    fused = _gmu_n(p["gmu"], [last_l, last_v, last_a])
    hproj = F.relu(fused @ _t(p["proj1"]["kernel"]) + _t(p["proj1"]["bias"]))
    hproj = hproj @ _t(p["proj2"]["kernel"]) + _t(p["proj2"]["bias"])
    logits = (hproj + fused) @ _t(p["out_layer"]["kernel"]) \
        + _t(p["out_layer"]["bias"])
    np.testing.assert_allclose(ours, logits.detach().numpy(),
                               atol=5e-4, rtol=1e-3)
