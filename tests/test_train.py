"""Training-layer tests: losses, plateau/early-stop, full loop on synthetic
data with checkpoint/resume (SURVEY.md §4 integration tier)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bpx.config import (BertConfig, DataConfig, ExperimentConfig, ModelConfig,
                        TrainConfig, get_preset)
from bpx.train.losses import (bce_with_logits, inverse_frequency_weights,
                              l1_loss, make_loss_fn, weighted_cross_entropy)
from bpx.train.optim import EarlyStopping, PlateauScheduler


# ---------------------------------------------------------------------------
# losses vs torch oracles (ref: train.py:99-120)
# ---------------------------------------------------------------------------

def test_bce_matches_torch(rng):
    logits = rng.randn(4, 6).astype(np.float32)
    targets = (rng.rand(4, 6) > 0.5).astype(np.float32)
    pw = rng.rand(6).astype(np.float32) * 3 + 0.1
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                 jnp.asarray(pw)))
    oracle = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(targets)).item()
    assert abs(ours - oracle) < 1e-4


def test_weighted_ce_matches_torch(rng):
    logits = rng.randn(8, 5).astype(np.float32)
    targets = rng.randint(0, 5, 8)
    w = rng.rand(5).astype(np.float32) + 0.1
    ours = float(weighted_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(targets),
                                        jnp.asarray(w)))
    oracle = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(targets)).item()
    assert abs(ours - oracle) < 1e-4


def test_l1_matches_torch(rng):
    a = rng.randn(7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    ours = float(l1_loss(jnp.asarray(a), jnp.asarray(b)))
    oracle = torch.nn.L1Loss()(torch.tensor(a), torch.tensor(b)).item()
    assert abs(ours - oracle) < 1e-6


def test_inverse_frequency_weights():
    w = inverse_frequency_weights([10, 40], 100)
    np.testing.assert_allclose(w, [10.0, 2.5])


# ---------------------------------------------------------------------------
# schedulers (ref: train.py:128-136, 405-439)
# ---------------------------------------------------------------------------

def test_plateau_reduces_after_patience():
    s = PlateauScheduler(lr=1.0, mode="max", factor=0.5, patience=2)
    assert s.step(0.5) == 1.0      # best
    assert s.step(0.4) == 1.0      # bad 1
    assert s.step(0.4) == 1.0      # bad 2
    assert s.step(0.4) == 0.5      # bad 3 > patience -> reduce
    assert s.step(0.9) == 0.5      # new best, lr stays reduced


def test_plateau_min_mode():
    s = PlateauScheduler(lr=1.0, mode="min", factor=0.1, patience=0)
    s.step(1.0)
    assert s.step(2.0) == 0.1      # worse in min mode -> immediate reduce


def test_early_stopping():
    e = EarlyStopping(patience=2, mode="max")
    assert e.update(0.5) and not e.should_stop
    assert e.update(0.5)           # ties count as improvement (>=)
    assert not e.update(0.4)
    assert not e.update(0.3) and e.should_stop
    state = e.state_dict()
    e2 = EarlyStopping(patience=2)
    e2.load_state_dict(state)
    assert e2.best == 0.5 and e2.n_no_improve == 2


def test_make_loss_fn_dispatch():
    fn = make_loss_fn("moviescope", "multilabel", True, [5, 5], 10)
    out = fn(jnp.zeros((2, 2)), jnp.ones((2, 2)))
    assert np.isfinite(float(out))
    fn2 = make_loss_fn("cmu-mosi", "classification")
    out2 = fn2(jnp.zeros((3, 1)), jnp.asarray([1.0, -1.0, 0.5]))
    assert np.isfinite(float(out2))


def test_evaluate_excludes_wrap_padded_rows(rng):
    """Eval loss on a non-divisible eval set must exclude the wrap-padded
    rows of the final batch (VERDICT r2 weak #5)."""
    from bpx.train.loop import evaluate

    C = 3
    logits_all = rng.randn(6, C).astype(np.float32)
    targets_all = (rng.rand(6, C) > 0.5).astype(np.float32)
    # 6 valid samples in batches of 4: final batch wraps samples 0-1
    batches = [
        {"x": logits_all[:4], "target": targets_all[:4],
         "valid": np.array(4)},
        {"x": np.concatenate([logits_all[4:], logits_all[:2]]),
         "target": np.concatenate([targets_all[4:], targets_all[:2]]),
         "valid": np.array(2)},
    ]
    loss_fn = make_loss_fn("moviescope", "multilabel", False)

    def eval_step(params, batch):
        return {"loss": loss_fn(batch["x"], batch["target"]),
                "logits": batch["x"]}

    metrics, logits, targets, _ = evaluate(
        eval_step, None, batches, "moviescope", "multilabel",
        loss_fn=loss_fn)
    assert logits.shape[0] == 6
    want = float(loss_fn(jnp.asarray(logits_all), jnp.asarray(targets_all)))
    assert abs(metrics["loss"] - want) < 1e-6
    # the naive batch-mean-of-means (with wraps) differs — the test is
    # only meaningful if the padded rows would actually change the value
    naive = np.mean([float(eval_step(None, b)["loss"]) for b in batches])
    assert abs(naive - want) > 1e-6


# ---------------------------------------------------------------------------
# end-to-end synthetic training (integration tier)
# ---------------------------------------------------------------------------

def _tiny_exp(tmp_path, **train_kw):
    exp = get_preset("synthetic-tiny")
    import dataclasses
    return exp.replace(train=dataclasses.replace(
        exp.train, savedir=str(tmp_path), name="t",
        max_epochs=2, gradient_accumulation_steps=2, lr=2e-3,
        **train_kw))


@pytest.mark.slow
def test_train_loop_and_resume(tmp_path):
    from bpx.train.loop import test as run_test
    from bpx.train.loop import train as run_train

    exp = _tiny_exp(tmp_path)
    metrics = run_train(exp)
    assert "auc_pr_micro" in metrics
    rundir = os.path.join(str(tmp_path), "t")
    assert os.path.exists(os.path.join(rundir, "latest"))
    assert os.path.exists(os.path.join(rundir, "best"))
    assert os.path.exists(os.path.join(rundir, "config.json"))

    # resume: bump max_epochs, must continue from stored epoch
    import dataclasses
    exp2 = exp.replace(train=dataclasses.replace(exp.train, max_epochs=3))
    metrics2 = run_train(exp2)
    assert "auc_pr_micro" in metrics2

    # test path: restore best, write artifacts
    t_metrics = run_test(exp)
    for fname in ["test_labels_pred.txt", "test_labels_gold.txt",
                  "preds_raw.npy"]:
        assert os.path.exists(os.path.join(rundir, fname)), fname
    assert "auc_pr_micro" in t_metrics


@pytest.mark.slow
def test_loss_decreases_on_synthetic(tmp_path):
    """The optimizer must actually learn the synthetic signal."""
    import dataclasses
    from bpx.config import DataConfig
    from bpx.data.loaders import get_data_loaders
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.loop import _example_batch, _stack_accum, \
        init_model_and_state
    from bpx.train.optim import make_optimizer
    from bpx.train.steps import make_train_step

    exp = get_preset("synthetic-tiny")
    dcfg = dataclasses.replace(exp.data, batch_sz=8, synthetic_len=32)
    train_loader, _, _, meta = get_data_loaders(dcfg, exp.model, seed=0)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, False)
    example = _example_batch(train_loader)
    model, tx, state = init_model_and_state(
        exp.replace(data=dcfg), example, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                   grad_accum=1))
    batch = {k: jnp.asarray(v[None]) for k, v in example.items()
             if k != "valid"}
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


@pytest.mark.slow
def test_chained_step_matches_sequential():
    """bench.make_chained_step(k) must run k real optimizer steps with the
    same semantics as k sequential train-step calls (same per-step dropout
    keys via the step counter, same update math) — it is a measurement
    tool, and any drift would mean the chained numbers time a different
    program.  SGD is used because it is linear in the gradient: the scan
    and standalone programs fuse (and so round) differently at the 1e-7
    level, and Adam's m/sqrt(v) normalisation amplifies that to full
    update scale on near-zero-gradient elements (measured: 2e-4 after 3
    steps), which would test XLA's rounding, not the chain.  Also pins
    that the returned scalar equals the k-th step's loss (the 0-weight
    final-param probe term must not perturb it)."""
    import dataclasses

    import optax

    import bench
    from bpx.data.loaders import get_data_loaders
    from bpx.train.loop import _example_batch, init_model_and_state
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step

    exp = get_preset("synthetic-tiny")
    dcfg = dataclasses.replace(exp.data, batch_sz=4, synthetic_len=8)
    train_loader, _, _, _ = get_data_loaders(dcfg, exp.model, seed=0)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, False)
    example = _example_batch(train_loader)
    model, _, state0 = init_model_and_state(
        exp.replace(data=dcfg), example, jax.random.PRNGKey(0))
    tx = optax.sgd(1e-2)
    state = TrainState.create(state0.params, tx)
    inner = make_train_step(model, exp.model.model, loss_fn, tx,
                            grad_accum=1)
    batch = {k: jnp.asarray(v[None]) for k, v in example.items()
             if k != "valid"}
    rng = jax.random.PRNGKey(7)

    step = jax.jit(inner)
    seq_state, losses = state, []
    for _ in range(3):
        seq_state, m = step(seq_state, batch, rng)
        losses.append(float(m["loss"]))

    chained = jax.jit(bench.make_chained_step(inner, 3))
    ch_state, final_loss = chained(state, batch, rng)

    assert abs(float(final_loss) - losses[-1]) < 1e-5
    # the model must actually have trained across the chain (3 distinct
    # steps, not the same step replayed)
    assert losses[-1] < losses[0]
    assert int(ch_state.step) == int(seq_state.step) == 3
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(ch_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_accum_bf16_carry_close_to_fp32():
    """The opt-in bfloat16 accumulation carry (TrainConfig.accum_dtype)
    must produce parameter updates close to the exact fp32 carry — it
    rounds each micro-batch gradient sum to 8 mantissa bits, nothing
    more."""
    import dataclasses

    from bpx.data.loaders import get_data_loaders
    from bpx.train.loop import _example_batch, init_model_and_state
    from bpx.train.steps import make_train_step

    exp = get_preset("synthetic-tiny")
    dcfg = dataclasses.replace(exp.data, batch_sz=4, synthetic_len=8)
    train_loader, _, _, _ = get_data_loaders(dcfg, exp.model, seed=0)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, False)
    example = _example_batch(train_loader)
    model, tx, state = init_model_and_state(
        exp.replace(data=dcfg), example, jax.random.PRNGKey(0))
    # (A=2, micro=2, ...) super-batch
    batch = {k: jnp.asarray(v.reshape((2, 2) + v.shape[1:]))
             for k, v in example.items() if k != "valid"}
    rng = jax.random.PRNGKey(7)

    outs = {}
    for dt in (None, "bfloat16"):
        step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                       grad_accum=2, accum_dtype=dt))
        new_state, m = step(state, batch, rng)
        outs[dt] = (new_state, float(m["loss"]))

    assert abs(outs[None][1] - outs["bfloat16"][1]) < 1e-5  # loss sums fp32
    # updates (not raw params) must agree to bf16 rounding accuracy
    diffs, mags = [], []
    for p0, pa, pb in zip(jax.tree.leaves(state.params),
                          jax.tree.leaves(outs[None][0].params),
                          jax.tree.leaves(outs["bfloat16"][0].params)):
        diffs.append(np.abs(np.asarray(pa) - np.asarray(pb)).mean())
        mags.append(np.abs(np.asarray(pa) - np.asarray(p0)).mean())
    assert np.mean(diffs) < 0.05 * max(np.mean(mags), 1e-12), \
        (np.mean(diffs), np.mean(mags))


@pytest.mark.slow
def test_accum_unroll_matches_scan():
    """The python-unrolled accumulation (TrainConfig.accum_unroll) must
    produce the same update as the lax.scan form: the gradient sum order
    is identical (0 + g0 == g0 exactly), only XLA fusion boundaries
    differ, so params must agree to fusion-rounding tolerance."""
    import dataclasses

    from bpx.data.loaders import get_data_loaders
    from bpx.train.loop import _example_batch, init_model_and_state
    from bpx.train.steps import make_train_step

    exp = get_preset("synthetic-tiny")
    dcfg = dataclasses.replace(exp.data, batch_sz=4, synthetic_len=8)
    train_loader, _, _, _ = get_data_loaders(dcfg, exp.model, seed=0)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, False)
    example = _example_batch(train_loader)
    model, tx, state = init_model_and_state(
        exp.replace(data=dcfg), example, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v.reshape((2, 2) + v.shape[1:]))
             for k, v in example.items() if k != "valid"}
    rng = jax.random.PRNGKey(7)

    outs = {}
    for unroll in (False, True):
        step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                       grad_accum=2, accum_unroll=unroll))
        new_state, m = step(state, batch, rng)
        outs[unroll] = (new_state, float(m["loss"]))

    assert abs(outs[False][1] - outs[True][1]) < 1e-5
    for a, b in zip(jax.tree.leaves(outs[False][0].params),
                    jax.tree.leaves(outs[True][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # lax.scan unroll=k (sequential carry, k bodies per trip) is the
    # bounded-liveness variant of the same program — identical numerics
    step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                   grad_accum=2, accum_scan_unroll=2))
    new_state, m = step(state, batch, rng)
    assert abs(outs[False][1] - float(m["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(outs[False][0].params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_config_json_round_trip():
    """config_from_dict must invert the config.json snapshot that
    CheckpointManager.save_config writes (the export CLI rebuilds the
    model from it), for every preset, across the JSON tuple->list
    coercion, and must ignore unknown keys from other config versions."""
    import dataclasses
    import json

    from bpx.config import PRESETS, config_from_dict, get_preset

    for name in PRESETS:
        exp = get_preset(name)
        snap = json.loads(json.dumps(dataclasses.asdict(exp), default=str))
        assert config_from_dict(snap) == exp, name

    snap = json.loads(json.dumps(
        dataclasses.asdict(get_preset("synthetic-tiny")), default=str))
    snap["train"]["retired_flag"] = True
    snap["model"]["bert"]["future_field"] = 3
    assert config_from_dict(snap) == get_preset("synthetic-tiny")


def test_default_accum_divides_batch():
    """bench.default_accum must return a divisor of the batch for every
    preset (a non-divisor would trip measure_tpu's reshape assert only
    AFTER the up-to-30-min device-wait gate) and keep the remat-free
    moviescope preset inside its micro-batch <= 8 memory envelope."""
    import bench

    for preset in ("moviescope", "mmimdb", "iemocap", "cmu-mosei"):
        for batch in (1, 2, 7, 12, 28, 63, 64, 65, 95, 96):
            a = bench.default_accum(preset, batch)
            assert batch % a == 0, (preset, batch, a)
            if preset == "moviescope" and batch > 8:
                assert batch // a <= 8, (batch, a)


def test_env_flag_convention(monkeypatch):
    from bpx.utils.env import env_flag

    monkeypatch.delenv("BPX_TEST_KNOB", raising=False)
    assert env_flag("BPX_TEST_KNOB", True) is True
    assert env_flag("BPX_TEST_KNOB", False) is False
    monkeypatch.setenv("BPX_TEST_KNOB", "0")
    assert env_flag("BPX_TEST_KNOB", True) is False
    monkeypatch.setenv("BPX_TEST_KNOB", "1")
    assert env_flag("BPX_TEST_KNOB", False) is True


def test_step_timer():
    from bpx.utils.profiling import StepTimer
    import time as _time
    t = StepTimer(window=4)
    for _ in range(6):
        t.start()
        _time.sleep(0.001)
        t.stop()
    assert len(t.times) == 4
    assert t.p50 >= 0.001 and t.p90 >= t.p50
    assert "samples/s" in t.summary(8)


def test_adamw_matches_torch(rng):
    """`--optimizer adamw` (the demo notebooks' optimizer, DEMO cell 60:
    torch.optim.AdamW defaults) — lockstep parity on a tiny quadratic:
    optax's decoupled decay -lr*(adam + wd*p) equals torch's
    p*(1-lr*wd) - lr*adam."""
    import optax
    from bpx.train.optim import get_current_lr, make_optimizer, set_lr

    lr = 3e-3
    w0 = rng.randn(5, 3).astype(np.float32)
    tgt = rng.randn(5, 3).astype(np.float32)

    tx = make_optimizer(lr, "adamw")
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    assert abs(get_current_lr(state) - lr) < 1e-9

    w_t = torch.tensor(w0, requires_grad=True)
    tgt_t = torch.tensor(tgt)
    opt = torch.optim.AdamW([w_t], lr=lr)   # defaults: wd=0.01

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: jnp.sum((p["w"] - jnp.asarray(tgt)) ** 2))(params)
        upd, state = tx.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    for i in range(8):
        if i == 5:   # the plateau scheduler path must work for adamw too
            state = set_lr(state, lr * 0.5)
            for grp in opt.param_groups:
                grp["lr"] = lr * 0.5
        params, state, _ = step(params, state)
        opt.zero_grad()
        torch.sum((w_t - tgt_t) ** 2).backward()
        opt.step()

    np.testing.assert_allclose(np.asarray(params["w"]),
                               w_t.detach().numpy(), rtol=1e-5, atol=1e-6)
