"""Lockstep training parity: N full optimizer steps, flax vs torch oracle.

Forward-only logit parity (test_model_parity) cannot catch backward,
optimizer, or loss bugs.  This harness runs the same five Adam steps on the
mmtrvat graph twice — once through the framework's real code path
(``make_loss_fn`` + ``make_optimizer`` + ``jax.grad``; ref: train.py:99-136
``get_criterion``/``get_optimizer`` and the hot loop train.py:387-398) and
once through a fully differentiable torch oracle whose parameters are the
torchified flax tree — and asserts the loss trajectory and final logits
match.  This is the SURVEY.md §6 training-dynamics evidence, built as a
lockstep oracle because no real datasets exist in this environment.

The torch oracle reuses the forward oracles from test_model_parity /
test_encoder (their ``_t`` passes torch tensors through, so autograd flows
into the leaf tensors) plus a differentiable post-LN BERT oracle here.
No dropout (both sides deterministic); plain Adam (optax.adam and
torch.optim.Adam implement the identical bias-corrected update).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as F

from bpx.config import BertConfig, ModelConfig
from bpx.models import get_model
from bpx.ops.positions import positional_embedding
from bpx.train.losses import make_loss_fn
from bpx.train.optim import make_optimizer
from tests.test_model_parity import (E, H, OracleEncoder, _gmu_feat, _gmu_n,
                                     _t)

LR = 5e-3
STEPS = 5


def _torchify(tree):
    """Flax param tree -> nested dict of requires_grad torch leaves."""
    if isinstance(tree, dict):
        return {k: _torchify(v) for k, v in tree.items()}
    t = torch.tensor(np.asarray(tree, dtype=np.float32))
    t.requires_grad_(True)
    return t


def _leaves(tree):
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree):
            out.extend(_leaves(tree[k]))
        return out
    return [tree]


class DiffOracleEncoder(OracleEncoder):
    """OracleEncoder over torch inputs: positions from detached data (the
    channel-0 padding rule is data-dependent but piecewise constant)."""

    @staticmethod
    def embed(x):
        pe = np.asarray(positional_embedding(
            jnp.asarray(x.detach().numpy().astype(np.float32))))
        return math.sqrt(E) * x + torch.tensor(pe)


def _bert_oracle(p, ids, mask, seg, cfg: BertConfig):
    """Differentiable torch BERT (post-LN, erf GELU, eps 1e-12) matching
    bpx.ops.bert.BertEncoder."""
    eps = cfg.layer_norm_eps
    Hn = cfg.num_heads
    Eb = cfg.hidden_size
    D = Eb // Hn
    T = ids.shape[1]

    def ln(x, prm):
        return F.layer_norm(x, (Eb,), prm["scale"], prm["bias"], eps=eps)

    h = p["word_embeddings"]["embedding"][ids]
    h = h + p["position_embeddings"]["embedding"][:T][None]
    if cfg.use_token_type:
        h = h + p["token_type_embeddings"]["embedding"][seg]
    h = ln(h, p["embeddings_norm"])

    bias = torch.where(torch.as_tensor(mask)[:, None, None, :] > 0,
                       0.0, torch.tensor(float(-1e30)))
    i = 0
    while f"layer{i}" in p:
        pl = p[f"layer{i}"]
        B = h.shape[0]

        def proj(name):
            d = pl["attention"][name]
            return (h @ d["kernel"] + d["bias"]).reshape(B, T, Hn, D)

        q, k, v = proj("query"), proj("key"), proj("value")
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(D)
        probs = F.softmax(scores + bias, dim=-1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, Eb)
        attn = ctx @ pl["attention_output"]["kernel"] \
            + pl["attention_output"]["bias"]
        h = ln(h + attn, pl["attention_norm"])
        inter = F.gelu(h @ pl["intermediate"]["kernel"]
                       + pl["intermediate"]["bias"])
        out = inter @ pl["output"]["kernel"] + pl["output"]["bias"]
        h = ln(h + out, pl["output_norm"])
        i += 1
    return h


def _vat_oracle_logits(p, cfg, txt, mask, seg, video, audio):
    """Differentiable torch forward of the mmtrvat graph (same dataflow as
    test_model_parity.test_vat_logits_match_torch_oracle)."""
    proj_l = _bert_oracle(p["bert"], torch.as_tensor(txt), mask,
                          torch.as_tensor(seg), cfg.bert)
    proj_v = torch.as_tensor(video) @ p["proj_v"]["kernel"]
    proj_a = torch.as_tensor(audio) @ p["proj_a"]["kernel"]

    enc = lambda name: DiffOracleEncoder(p[name], False)
    h_v_as = enc("trans_v_with_a")(proj_v, proj_a)
    h_a_vs = enc("trans_a_with_v")(proj_a, proj_v)
    h_v_ls = enc("trans_v_with_l")(proj_v, proj_l)
    h_l_vs = enc("trans_l_with_v")(proj_l, proj_v)
    h_a_ls = enc("trans_a_with_l")(proj_a, proj_l)
    h_l_as = enc("trans_l_with_a")(proj_l, proj_a)

    bi1 = enc("trans_l_with_v2a")(proj_l, h_a_vs)
    bi2 = enc("trans_l_with_a2v")(proj_l, h_v_as)
    mid = _gmu_feat(p["gmu_l_m"], h_v_as, h_a_vs)
    top = _gmu_feat(p["gmu_l"], bi2 + h_v_as, bi1 + h_a_vs) + mid
    last_l = top[:, 0] + top[:, -1]

    bi1 = enc("trans_a_with_v2l")(proj_a, h_l_vs)
    bi2 = enc("trans_a_with_l2v")(proj_a, h_v_ls)
    mid = _gmu_feat(p["gmu_a_m"], h_l_vs, h_v_ls)
    top = _gmu_feat(p["gmu_a"], bi1 + h_l_vs, bi2 + h_v_ls) + mid
    last_a = top[:, 0] + top[:, -1]

    bi1 = enc("trans_v_with_a2l")(proj_v, h_l_as)
    bi2 = enc("trans_v_with_l2a")(proj_v, h_a_ls)
    mid = _gmu_feat(p["gmu_v_m"], h_l_as, h_a_ls)
    top = _gmu_feat(p["gmu_v"], bi1 + h_l_as, bi2 + h_a_ls) + mid
    last_v = top[:, 0] + top[:, -1]

    fused = _gmu_n(p["gmu"], [last_l, last_v, last_a])
    hproj = F.relu(fused @ p["proj1"]["kernel"] + p["proj1"]["bias"])
    hproj = hproj @ p["proj2"]["kernel"] + p["proj2"]["bias"]
    return (hproj + fused) @ p["out_layer"]["kernel"] + p["out_layer"]["bias"]


def test_lockstep_training_parity():
    cfg = ModelConfig(
        model="mmtrvat", n_classes=3,
        orig_d_l=E, orig_d_v=11, orig_d_a=7,
        hidden_sz=E, num_heads=H, layers=1,
        num_vectors_l=12, num_vectors_a=12, num_vectors_v=12,
        use_audio_encoder=False, use_poster=False, attn_mask=True,
        bert=BertConfig(vocab_size=200, hidden_size=E, num_layers=1,
                        num_heads=2, intermediate_size=64),
        compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.RandomState(7)
    B, L = 2, 12
    txt = rng.randint(1, 200, (B, L))
    mask = np.ones((B, L), np.int32)
    seg = np.zeros((B, L), np.int32)
    video = rng.randn(B, 12, cfg.orig_d_v).astype(np.float32)
    audio = rng.randn(B, 12, cfg.orig_d_a).astype(np.float32)
    targets = (rng.rand(B, cfg.n_classes) > 0.5).astype(np.float32)

    batch = tuple(jnp.asarray(a) for a in (txt, mask, seg, video, audio))
    params = model.init({"params": jax.random.PRNGKey(0)}, *batch)["params"]

    # --- framework side: real loss + real optimizer --------------------
    loss_fn = make_loss_fn("synthetic", "multilabel", False)
    tx = make_optimizer(LR)
    opt_state = tx.init(params)
    tgt = jnp.asarray(targets)

    @jax.jit
    def step(params, opt_state):
        def objective(prm):
            return loss_fn(model.apply({"params": prm}, *batch), tgt)
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

    # --- oracle side: torchified leaves + torch.optim.Adam -------------
    p_t = _torchify(model.init({"params": jax.random.PRNGKey(0)},
                               *batch)["params"])
    opt = torch.optim.Adam(_leaves(p_t), lr=LR, betas=(0.9, 0.999), eps=1e-8)
    tgt_t = torch.tensor(targets)
    torch_losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        logits = _vat_oracle_logits(p_t, cfg, txt, mask, seg, video, audio)
        loss = F.binary_cross_entropy_with_logits(logits, tgt_t)
        loss.backward()
        torch_losses.append(float(loss.detach()))
        opt.step()

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                               atol=2e-4, err_msg="loss trajectory diverged")

    # final logits after 5 updates
    final_jax = np.asarray(model.apply({"params": params}, *batch))
    with torch.no_grad():
        final_torch = _vat_oracle_logits(p_t, cfg, txt, mask, seg,
                                         video, audio).numpy()
    np.testing.assert_allclose(final_jax, final_torch, atol=5e-3, rtol=5e-3)
    # sanity: training actually moved the loss
    assert torch_losses[-1] < torch_losses[0]
