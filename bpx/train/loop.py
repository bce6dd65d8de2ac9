"""Training driver (ref: train.py:341-505).

``train(exp)`` — full epoch loop with:
* microbatch gradient accumulation inside one compiled step
  (ref: train.py:390-398);
* per-epoch validation, plateau LR schedule on the tuning metric
  (ref: train.py:401-408);
* early stopping with patience (ref: train.py:432-439);
* checkpoint best + latest, auto-resume (ref: train.py:372-379,413-430);
* optional jax.profiler traces and per-step throughput logging (the
  reference has no profiling — SURVEY.md §5.1).

``test(exp)`` — restore best, evaluate, dump prediction/gate artifacts
(ref: train.py:451-480).

``seed_sweep(exp)`` — the reference's cli_main seed loop
(ref: train.py:483-505).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bpx.config import ExperimentConfig
from bpx.data.loaders import get_data_loaders
from bpx.models import get_model
from bpx.ops.bert import maybe_load_pretrained
from bpx.parallel.mesh import make_mesh, mesh_scoped
from bpx.train.losses import make_loss_fn
from bpx.train.metrics import compute_metrics, log_metrics, tuning_metric
from bpx.train.optim import (EarlyStopping, PlateauScheduler, get_current_lr,
                             make_optimizer, set_lr)
from bpx.train.state import TrainState
from bpx.train.steps import (make_eval_step, make_train_step, place_batch,
                             place_state)
# NOTE: steps.cast_features is intentionally NOT applied here — feeding bf16
# feature streams measured +12% step time on TPU (see PERF.md); the probe
# keeps it as an opt-in knob (perf_probe --cast 1).
from bpx.utils.artifacts import store_preds_to_disk
from bpx.utils.checkpoint import CheckpointManager
from bpx.utils.logging import create_logger
from bpx.utils.seeding import set_seed


def _example_batch(loader):
    """Pull one batch to build init shapes (host-side, cheap)."""
    for batch in loader:
        return batch
    raise RuntimeError("empty loader")


def init_model_and_state(exp: ExperimentConfig, example_batch, root_key):
    """Build model, init params (+ optional pretrained BERT), optimizer."""
    model = get_model(exp.model)
    from bpx.train.steps import model_inputs
    inputs = model_inputs(exp.model.model,
                          {k: jnp.asarray(v[:1]) for k, v in
                           example_batch.items() if k != "valid"})
    params = model.init({"params": root_key}, *inputs)["params"]
    if exp.model.bert_init == "pretrained":
        params = maybe_load_pretrained(dict(params), exp.model.bert,
                                       exp.model.bert_weights_path,
                                       exp.model.scan_layers)
    tx = make_optimizer(exp.train.lr, exp.train.optimizer)
    state = TrainState.create(params, tx)
    return model, tx, state


def _stack_accum(batches):
    """Stack A host batches into one (A, micro, ...) super-batch."""
    keys = [k for k in batches[0] if k != "valid"]
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def evaluate(eval_step_fn, params, loader, task: str, task_type: str,
             mesh=None, collect_gates: bool = False, loss_fn=None):
    """No-grad eval loop -> stacked metrics
    (ref: train.py:165-280 ``model_eval``).

    When ``loss_fn`` is given, the reported loss is recomputed host-side
    over the concatenated valid-sliced logits/targets — the wrap-padded
    rows of the final partial batch (loaders.py BatchIterator) are
    provably excluded, and there is no mean-of-batch-means bias.
    Without it, falls back to a valid-count-weighted mean of the
    per-batch device losses (still includes padded rows in the final
    batch's own mean).
    """
    all_logits, all_targets, all_gates = [], [], []
    batch_losses, batch_weights = [], []
    for batch in loader:
        valid = batch.pop("valid", None)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            jbatch = place_batch(jbatch, mesh, has_accum_axis=False)
        out = eval_step_fn(params, jbatch)
        logits = np.asarray(out["logits"])
        n = logits.shape[0] if valid is None else int(valid.sum())
        all_logits.append(logits[:n])
        all_targets.append(np.asarray(batch["target"])[:n])
        if loss_fn is None:     # else recomputed host-side below — skip
            if "loss" not in out:   # eval_step built without a loss_fn
                raise ValueError(
                    "eval_step emits no 'loss'; pass loss_fn to evaluate() "
                    "or build make_eval_step with one")
            batch_losses.append(float(out["loss"]))    # the device fetch
            batch_weights.append(n)
        if collect_gates and "gates" in out:
            all_gates.append(np.asarray(out["gates"])[:n])
    logits = np.concatenate(all_logits)
    targets = np.concatenate(all_targets)
    if loss_fn is not None:
        losses = np.asarray(
            [float(loss_fn(jnp.asarray(logits), jnp.asarray(targets)))])
        weights = None
    else:
        losses, weights = np.asarray(batch_losses), np.asarray(batch_weights)
    metrics = compute_metrics(task, task_type, logits, targets,
                              losses, weights)
    gates = np.concatenate(all_gates) if all_gates else None
    return metrics, logits, targets, gates


def train(exp: ExperimentConfig, data_all=None,
          partition_index=None) -> Dict[str, float]:
    tcfg, dcfg, mcfg = exp.train, exp.data, exp.model
    savedir = os.path.join(tcfg.savedir, tcfg.name)
    os.makedirs(savedir, exist_ok=True)
    logger = create_logger(os.path.join(savedir, "logfile.log"), exp)

    root_key = set_seed(tcfg.seed)
    train_loader, val_loader, _, meta = get_data_loaders(
        dcfg, mcfg, seed=tcfg.seed, data_all=data_all,
        partition_index=partition_index)
    if meta.n_classes != mcfg.n_classes and dcfg.task != "cmu-mosi":
        # the label scan is authoritative (ref: helpers.py:163 sets
        # args.n_classes from the train.jsonl label set).  Documented
        # divergence for cmu-mosi: the scan over its continuous float
        # labels would size the head by the count of DISTINCT training
        # values (the reference does exactly that and then broadcasts
        # L1 over every column, train.py:113-114) — here the regression
        # head stays at the preset's n_classes=1.
        mcfg = mcfg.replace(n_classes=meta.n_classes)
        exp = exp.replace(model=mcfg)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, tcfg.weight_classes,
                           [meta.label_freqs[l] for l in meta.labels],
                           meta.train_data_len)

    example = _example_batch(train_loader)
    model, tx, state = init_model_and_state(exp, example, root_key)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info("model %s: %.2fM params", mcfg.model, n_params / 1e6)

    # Mesh: data-parallel over all local devices (ref equivalent:
    # nn.DataParallel, train.py:354-356).
    devices = jax.devices()
    mesh = make_mesh(tcfg.mesh) if len(devices) > 1 else None
    if mesh is not None:
        state = place_state(state, mesh)
        logger.info("mesh: %s", mesh)

    accum = max(1, tcfg.gradient_accumulation_steps)
    train_step = mesh_scoped(jax.jit(make_train_step(
        model, mcfg.model, loss_fn, tx, grad_accum=accum,
        freeze_bert=mcfg.freeze_bert,
        accum_dtype=tcfg.accum_dtype,
        accum_unroll=tcfg.accum_unroll,
        accum_scan_unroll=tcfg.accum_scan_unroll),
        donate_argnums=(0,)), mesh)
    # no device-side loss output: evaluate() recomputes it host-side over
    # the valid-sliced concatenation (wrap-padded rows excluded)
    eval_step = mesh_scoped(
        jax.jit(make_eval_step(model, mcfg.model)), mesh)

    mode = "min" if dcfg.task == "cmu-mosi" else "max"
    plateau = PlateauScheduler(lr=tcfg.lr, mode=mode, factor=tcfg.lr_factor,
                               patience=tcfg.lr_patience)
    stopper = EarlyStopping(patience=tcfg.patience, mode=mode)
    ckpt = CheckpointManager(savedir)
    ckpt.save_config(exp)

    start_epoch = 0
    if ckpt.has_checkpoint("latest"):
        # auto-resume (ref: train.py:372-379)
        state, host = ckpt.restore(state, "latest")
        if mesh is not None:
            state = place_state(state, mesh)
        start_epoch = int(host.get("epoch", 0))
        stopper.load_state_dict(host.get("stopper", stopper.state_dict()))
        plateau.load_state_dict(host.get("plateau", plateau.state_dict()))
        state = state.replace(opt_state=set_lr(state.opt_state, plateau.lr))
        logger.info("resumed from epoch %d (best %.4f)", start_epoch,
                    stopper.best)

    # Dropout PRNG: rbg rides the TPU hardware RNG (threefry mask generation
    # measured ~35% of the moviescope step time).
    if tcfg.rng_impl == "rbg":
        rng = jax.random.key(tcfg.seed * 7919 + 17, impl="rbg")
    else:
        rng = jax.random.fold_in(root_key, 17)
    final_metrics: Dict[str, float] = {}

    if tcfg.profile_dir:
        jax.profiler.start_trace(tcfg.profile_dir)

    from bpx.utils.profiling import StepTimer
    timer = StepTimer()

    for epoch in range(start_epoch, tcfg.max_epochs):
        epoch_losses = []
        buffered = []
        t0 = time.time()
        n_samples = 0
        for batch in train_loader:
            batch.pop("valid", None)
            buffered.append(batch)
            if len(buffered) < accum:
                continue
            super_batch = _stack_accum(buffered)
            n_samples += super_batch["txt"].shape[0] * \
                super_batch["txt"].shape[1]
            buffered = []
            timer.start()
            jbatch = {k: jnp.asarray(v) for k, v in super_batch.items()}
            if mesh is not None:
                jbatch = place_batch(jbatch, mesh, has_accum_axis=True)
            state, step_metrics = train_step(state, jbatch, rng)
            epoch_losses.append(step_metrics["loss"])
            timer.stop()
        if not epoch_losses:
            raise RuntimeError(
                f"epoch produced no optimizer steps: need at least "
                f"{accum} batches of {dcfg.batch_sz}")
        train_loss = float(np.mean([float(l) for l in epoch_losses]))
        dt = time.time() - t0
        logger.info("Epoch %d | Train Loss: %.4f | %.1f samples/s | "
                    "step %s | lr %.2e",
                    epoch, train_loss, n_samples / max(dt, 1e-9),
                    timer.summary(n_samples // max(len(epoch_losses), 1)),
                    get_current_lr(state.opt_state))

        metrics, *_ = evaluate(eval_step, state.params, val_loader,
                               dcfg.task, dcfg.task_type, mesh,
                               loss_fn=loss_fn)
        log_metrics(f"Val epoch {epoch}", metrics, dcfg.task, logger)

        tune = tuning_metric(dcfg.task, dcfg.task_type, metrics)
        new_lr = plateau.step(tune)
        state = state.replace(opt_state=set_lr(state.opt_state, new_lr))

        improved = stopper.update(tune)
        if improved:
            ckpt.save(state, {"epoch": epoch + 1,
                              "stopper": stopper.state_dict(),
                              "plateau": plateau.state_dict()},
                      is_best=True)
        final_metrics = metrics
        if stopper.should_stop:
            logger.info("No improvement. Breaking out of loop.")
            break

    if tcfg.profile_dir:
        jax.profiler.stop_trace()
    return final_metrics


def test(exp: ExperimentConfig, data_all=None,
         partition_index=None) -> Dict[str, float]:
    tcfg, dcfg, mcfg = exp.train, exp.data, exp.model
    savedir = os.path.join(tcfg.savedir, tcfg.name)
    logger = create_logger(os.path.join(savedir, "logfileTest.log"), exp)

    root_key = set_seed(tcfg.seed)
    _, _, test_loader, meta = get_data_loaders(
        dcfg, mcfg, seed=tcfg.seed, data_all=data_all,
        partition_index=partition_index)
    if meta.n_classes != mcfg.n_classes and dcfg.task != "cmu-mosi":
        mcfg = mcfg.replace(n_classes=meta.n_classes)
        exp = exp.replace(model=mcfg)
    loss_fn = make_loss_fn(dcfg.task, dcfg.task_type, tcfg.weight_classes,
                           [meta.label_freqs[l] for l in meta.labels],
                           max(meta.train_data_len, 1))

    example = _example_batch(test_loader)
    model, tx, state = init_model_and_state(exp, example, root_key)
    ckpt = CheckpointManager(savedir)
    if ckpt.has_checkpoint("best"):
        state, _ = ckpt.restore(state, "best")
    else:
        logger.info("no best checkpoint found — evaluating fresh init")

    mesh = make_mesh(tcfg.mesh) if len(jax.devices()) > 1 else None
    if mesh is not None:
        state = place_state(state, mesh)

    eval_step = mesh_scoped(
        jax.jit(make_eval_step(model, mcfg.model,
                               output_gates=tcfg.output_gates)), mesh)
    metrics, logits, targets, gates = evaluate(
        eval_step, state.params, test_loader, dcfg.task, dcfg.task_type,
        mesh, collect_gates=tcfg.output_gates, loss_fn=loss_fn)
    log_metrics("Test", metrics, dcfg.task, logger)

    if dcfg.task_type == "multilabel":
        raw = 1.0 / (1.0 + np.exp(-logits))
        preds = (raw > 0.5).astype(np.int64)
    else:
        raw = logits
        preds = logits.argmax(-1) if logits.shape[-1] > 1 else logits[:, 0]
    store_preds_to_disk(targets, preds, savedir, meta.labels,
                        dcfg.task_type, preds_raw=raw, gates=gates)
    return metrics


def seed_sweep(exp: ExperimentConfig) -> Dict[int, Dict[str, float]]:
    """Seed loop driver (ref: train.py:483-505)."""
    import dataclasses
    results = {}
    base_name = exp.train.name
    for i in range(exp.train.from_seed, exp.train.to_seed + 1):
        seed = (exp.train.to_seed + 1 - i) if exp.train.inverse_seed else i
        run = exp.replace(train=dataclasses.replace(
            exp.train, seed=seed,
            name=f"{base_name}_Seed{seed}_run"))
        if not exp.train.just_test:
            train(run)
        results[seed] = test(run)
    return results
