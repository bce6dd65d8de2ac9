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
import pytest
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


@pytest.mark.slow
def test_long_horizon_loop_parity():
    """Loop-level equivalence over a full tiny run: epochs until the
    plateau scheduler fires AND early stopping triggers in both
    frameworks.  The 5-step lockstep test above cannot pin the loop
    semantics — the accumulation boundary (optimizer step every A
    micro-batches, loss/A scaling; ref: train.py:390-398), the plateau
    comparison mode (torch ReduceLROnPlateau 'rel' threshold on the
    tuning metric; ref: train.py:128-136,408), and the patience
    bookkeeping (>= improvement, break at patience; ref:
    train.py:409-439).  The jax side uses the REAL loop components
    exactly as bpx.train.loop.train wires them (make_train_step with
    grad_accum, PlateauScheduler, EarlyStopping, tuning_metric, set_lr);
    the torch side is the reference's loop shape with torch's actual
    optim.lr_scheduler.ReduceLROnPlateau.

    Event equivalence is asserted by REPLAY, not across frameworks:
    once the val metric plateaus, whether epoch k counts as "bad" hangs
    on ~1e-6 logit drift through a rank-based metric (AUC-PR), so
    demanding the two training runs emit LR drops at identical epochs
    is numerically ill-posed (measured: same stop epoch, 7/10 LR values
    diverged).  Instead each run's OWN tuning-metric sequence is fed
    through the OTHER side's scheduler + patience bookkeeping and the
    resulting LR trajectory and stop epoch must match that run's
    exactly — this pins the decision semantics (threshold mode,
    comparison direction, patience counting, reduction timing) with no
    float-equality trap.  The trajectories themselves are asserted to
    tolerance, and both runs must fire a reduction and early-stop."""
    from bpx.train.metrics import compute_metrics, tuning_metric
    from bpx.train.optim import EarlyStopping, PlateauScheduler, set_lr
    from bpx.train.steps import make_train_step

    cfg = ModelConfig(
        model="mmtrvat", n_classes=3,
        orig_d_l=E, orig_d_v=11, orig_d_a=7,
        hidden_sz=E, num_heads=H, layers=1,
        num_vectors_l=12, num_vectors_a=12, num_vectors_v=12,
        use_audio_encoder=False, use_poster=False, attn_mask=True,
        # the torch oracle has no dropout; make_train_step trains with
        # deterministic=False, so every rate must be zero for lockstep
        attn_dropout=0.0, relu_dropout=0.0, res_dropout=0.0,
        out_dropout=0.0, embed_dropout=0.0,
        bert=BertConfig(vocab_size=200, hidden_size=E, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        hidden_dropout=0.0, attention_dropout=0.0),
        compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.RandomState(11)
    B, L, ACCUM = 2, 12, 2
    N_TRAIN, N_VAL = 8, 8
    MAX_EPOCHS, STOP_PATIENCE, LR_PATIENCE = 40, 4, 1
    lr0 = 5e-3

    def mk(n):
        return dict(
            txt=rng.randint(1, 200, (n, L)),
            mask=np.ones((n, L), np.int32),
            seg=np.zeros((n, L), np.int32),
            video=rng.randn(n, 12, cfg.orig_d_v).astype(np.float32),
            audio=rng.randn(n, 12, cfg.orig_d_a).astype(np.float32),
            tgt=(rng.rand(n, cfg.n_classes) > 0.5).astype(np.float32))

    train_d, val_d = mk(N_TRAIN), mk(N_VAL)
    keys = ("txt", "mask", "seg", "video", "audio")

    def micro(d, i):  # i-th micro-batch of B
        sl = slice(i * B, (i + 1) * B)
        return tuple(d[k][sl] for k in keys), d["tgt"][sl]

    n_micro = N_TRAIN // B
    assert n_micro % ACCUM == 0

    # ---- jax side: real loop components --------------------------------
    batch0 = tuple(jnp.asarray(a) for a in
                   tuple(train_d[k][:1] for k in keys))
    params = model.init({"params": jax.random.PRNGKey(0)}, *batch0)["params"]
    loss_fn = make_loss_fn("synthetic", "multilabel", False)
    tx = make_optimizer(lr0)
    from bpx.train.state import TrainState
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, cfg.model, loss_fn, tx,
                                   grad_accum=ACCUM))
    eval_fn = jax.jit(lambda p, *xs: model.apply({"params": p}, *xs))

    # super-batches (A, B, ...) in fixed order, as loop.py _stack_accum does
    supers = []
    for s in range(n_micro // ACCUM):
        group = [micro(train_d, s * ACCUM + a)[0] for a in range(ACCUM)]
        tgts = [micro(train_d, s * ACCUM + a)[1] for a in range(ACCUM)]
        sb = {k: jnp.asarray(np.stack([g[j] for g in group]))
              for j, k in enumerate(
                  ("txt", "mask", "segment", "video", "audio"))}
        sb["target"] = jnp.asarray(np.stack(tgts))
        supers.append(sb)
    val_inputs = tuple(jnp.asarray(val_d[k]) for k in keys)

    plateau = PlateauScheduler(lr=lr0, mode="max", factor=0.5,
                               patience=LR_PATIENCE)
    stopper = EarlyStopping(patience=STOP_PATIENCE, mode="max")
    jrng = jax.random.PRNGKey(3)   # dropout rngs are dead (all rates 0)

    jax_lrs, jax_losses, jax_tunes = [], [], []
    jax_stop, jax_steps = None, 0
    for epoch in range(MAX_EPOCHS):
        ep = []
        for sb in supers:
            state, m = step(state, sb, jrng)
            ep.append(float(m["loss"]))
            jax_steps += 1
        jax_losses.append(float(np.mean(ep)))
        logits = np.asarray(eval_fn(state.params, *val_inputs))
        metrics = compute_metrics("synthetic", "multilabel", logits,
                                  val_d["tgt"], np.asarray([0.0]), None)
        tune = tuning_metric("synthetic", "multilabel", metrics)
        jax_tunes.append(float(tune))
        new_lr = plateau.step(tune)
        state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
        jax_lrs.append(new_lr)
        stopper.update(tune)
        if stopper.should_stop:
            jax_stop = epoch
            break

    # ---- torch side: reference loop shape (train.py:382-439) -----------
    p_t = _torchify(model.init({"params": jax.random.PRNGKey(0)},
                               *batch0)["params"])
    opt = torch.optim.Adam(_leaves(p_t), lr=lr0, betas=(0.9, 0.999),
                           eps=1e-8)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=LR_PATIENCE)
    best, n_no_improve = float("-inf"), 0
    t_lrs, t_losses, t_tunes, t_stop, t_steps = [], [], [], None, 0
    for epoch in range(MAX_EPOCHS):
        ep = []
        opt.zero_grad()
        for i in range(n_micro):
            xs, tg = micro(train_d, i)
            logits = _vat_oracle_logits(p_t, cfg, *xs)
            loss = F.binary_cross_entropy_with_logits(
                logits, torch.tensor(tg)) / ACCUM
            loss.backward()
            ep.append(float(loss.detach()) * ACCUM)
            if (i + 1) % ACCUM == 0:     # ref: train.py:396-398
                opt.step()
                opt.zero_grad()
                t_steps += 1
        t_losses.append(float(np.mean(ep)))
        with torch.no_grad():
            logits = _vat_oracle_logits(
                p_t, cfg, *(tuple(val_d[k] for k in keys))).numpy()
        metrics = compute_metrics("synthetic", "multilabel", logits,
                                  val_d["tgt"], np.asarray([0.0]), None)
        tune = tuning_metric("synthetic", "multilabel", metrics)
        t_tunes.append(float(tune))
        sched.step(tune)                  # ref: train.py:408
        t_lrs.append(opt.param_groups[0]["lr"])
        if tune >= best:                  # ref: train.py:409-430
            best = tune
            n_no_improve = 0
        else:
            n_no_improve += 1
        if n_no_improve >= STOP_PATIENCE:   # ref: train.py:432-439
            t_stop = epoch
            break

    # ---- event-semantics equivalence by replay ---------------------------
    def torch_replay(tunes):
        """The reference's decision stack (torch ReduceLROnPlateau +
        train.py:409-439 bookkeeping) replayed over a metric sequence."""
        dummy = torch.optim.Adam([torch.zeros(1, requires_grad=True)],
                                 lr=lr0)
        s = torch.optim.lr_scheduler.ReduceLROnPlateau(
            dummy, mode="max", factor=0.5, patience=LR_PATIENCE)
        best, bad = float("-inf"), 0
        lrs, stop = [], None
        for epoch, tune in enumerate(tunes):
            s.step(tune)
            lrs.append(dummy.param_groups[0]["lr"])
            if tune >= best:
                best, bad = tune, 0
            else:
                bad += 1
            if bad >= STOP_PATIENCE:
                stop = epoch
                break
        return lrs, stop

    def bpx_replay(tunes):
        """bpx's decision stack (PlateauScheduler + EarlyStopping) over a
        metric sequence — exactly as loop.py:249-262 consumes them."""
        pl = PlateauScheduler(lr=lr0, mode="max", factor=0.5,
                              patience=LR_PATIENCE)
        st = EarlyStopping(patience=STOP_PATIENCE, mode="max")
        lrs, stop = [], None
        for epoch, tune in enumerate(tunes):
            lrs.append(pl.step(tune))
            st.update(tune)
            if st.should_stop:
                stop = epoch
                break
        return lrs, stop

    # the reference stack replayed over the jax run's own metrics must
    # reproduce the jax loop's events exactly — and vice versa
    ref_lrs, ref_stop = torch_replay(jax_tunes)
    assert ref_lrs == jax_lrs, (ref_lrs, jax_lrs)
    assert ref_stop == jax_stop, (ref_stop, jax_stop)
    bpx_lrs, bpx_stop = bpx_replay(t_tunes)
    assert bpx_lrs == t_lrs, (bpx_lrs, t_lrs)
    assert bpx_stop == t_stop, (bpx_stop, t_stop)

    # ---- trajectory equivalence ------------------------------------------
    assert jax_stop is not None and t_stop is not None, \
        (jax_stop, t_stop, "early stopping never fired; re-tune the test")
    assert jax_steps // (jax_stop + 1) == t_steps // (t_stop + 1), \
        "optimizer steps per epoch diverged (accumulation boundary)"
    assert min(jax_lrs) < lr0 and min(t_lrs) < lr0, \
        "plateau scheduler never fired"
    assert abs(jax_stop - t_stop) <= 3, (jax_stop, t_stop)
    # per-epoch loss trajectories track (drift grows with horizon)
    np.testing.assert_allclose(jax_losses[:5], t_losses[:5], rtol=5e-3,
                               atol=5e-4)
    horizon = min(len(jax_losses), len(t_losses))
    assert abs(jax_losses[horizon - 1] - t_losses[horizon - 1]) < 5e-2, \
        (jax_losses[horizon - 1], t_losses[horizon - 1])
