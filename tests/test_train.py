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
