"""Jitted train / eval steps with microbatch gradient accumulation.

The reference accumulates ``loss.backward()`` over
``gradient_accumulation_steps`` python-loop iterations and steps the
optimizer every k batches (ref: train.py:387-398).  TPU-native form: the
train step receives a super-batch shaped ``(A, micro, ...)`` and runs a
``lax.scan`` over the leading accumulation axis inside one compiled program —
one optimizer update per super-batch, no host round-trips, grads averaged
exactly like the reference's ``loss / accumulation_steps``.

Steps are built against a mesh: params follow
:func:`bpx.parallel.sharding.param_shardings`, batches shard their
micro-batch axis over ``(data, fsdp)``.  XLA inserts the gradient
all-reduce — the pjit equivalent of DataParallel's gather
(ref: train.py:354-356).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bpx.config import ModelConfig
from bpx.parallel.sharding import param_shardings, replicated
from bpx.train.state import TrainState

# Model input order (ref: model_forward unpack, train.py:283-321).
_INPUT_KEYS = {
    "mmtrvapt": ("txt", "mask", "segment", "video", "audio", "poster"),
    "mmtrvat": ("txt", "mask", "segment", "video", "audio"),
    "mmtrvpa": ("txt", "mask", "segment", "video", "audio"),
    "tmmtrvpa": ("txt", "mask", "segment", "video", "audio"),
    "gmu": ("txt", "mask", "segment", "video", "audio"),
    "gmu_bi": ("txt", "mask", "segment", "video"),
    "gmu_hier": ("txt", "mask", "segment", "video", "audio"),
    "gmu_softmax": ("txt", "mask", "segment", "video", "audio"),
    "bertclf": ("txt", "mask", "segment"),
    "bert": ("txt", "mask", "segment"),
}


def model_inputs(model_name: str, batch: Dict[str, jax.Array]):
    return tuple(batch[k] for k in _INPUT_KEYS[model_name])


# Float feature streams castable to the compute dtype.  NOT used on the
# default path: feeding bf16 features measured +12% step time on the
# moviescope bench (the downstream gather/projection fusions slow down more
# than the halved input traffic saves) -- kept as an opt-in probe knob
# (perf_probe --cast 1).  ``target`` stays fp32 (losses accumulate fp32).
_CASTABLE = ("video", "audio", "poster")


def cast_features(batch, dtype):
    """Cast the large float feature streams of ``batch`` to ``dtype``."""
    out = dict(batch)
    for k in _CASTABLE:
        if k in out and out[k].dtype == jnp.float32:
            out[k] = out[k].astype(dtype)
    return out


def make_grad_mask(params, freeze_bert: bool):
    """0/1 mask zeroing frozen subtrees (ref equivalent: freeze flags,
    train.py:301-302 — computed but unused there; here they work)."""
    if not freeze_bert:
        return None
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: 0.0 if any(
            getattr(p, "key", "") == "bert" for p in path) else 1.0,
        params)
    return flat


def make_train_step(model, model_name: str, loss_fn: Callable,
                    tx: optax.GradientTransformation,
                    grad_accum: int = 1,
                    freeze_bert: bool = False,
                    donate: bool = True,
                    with_grad_norm: bool = False,
                    accum_dtype: Optional[str] = None,
                    accum_unroll: bool = False,
                    accum_scan_unroll: int = 1):
    """Build the (unjitted) train step; wrap with jit/shardings via
    :func:`jit_train_step`.

    ``accum_dtype`` sets the dtype of the gradient-accumulation scan
    carry (default fp32 — exact).  ``"bfloat16"`` halves the carry's
    HBM read+write traffic (~1.8 GB/micro-step on the moviescope model,
    ~17 ms/step bound at accum 8) at the cost of rounding each
    micro-batch's gradient sum to 8 mantissa bits — an opt-in perf knob,
    never a default, because it changes update numerics.

    ``accum_unroll`` replaces the ``lax.scan`` over the accumulation axis
    with a python-unrolled straight-line program: no zero-initialised
    carry (the first micro-batch's gradients seed the accumulator — the
    sum order is identical, since ``0 + g0 == g0`` exactly in IEEE), no
    while-loop trip boundaries, and XLA is free to fuse each carry add
    into the producing backward and overlap micro-batch scheduling.  The
    accum-scan's inter-trip gaps measured ~129 ms of the 788 ms
    moviescope step (PERF.md round-4 re-trace) — this is the probe for
    that bucket.  Compile time and program size grow ~A-fold for the
    accumulation region.  Measured OOM at the moviescope bench config
    (PERF.md round 5): without the scan's sequential trip boundary XLA
    interleaves the micro-batch subgraphs and activation liveness grows
    past HBM.

    ``accum_scan_unroll`` is the bounded middle ground: ``lax.scan``'s
    own ``unroll=k`` — the carry dependency chain stays sequential
    (liveness bounded, unlike ``accum_unroll``) but each loop trip runs
    k micro-batch bodies, so trip boundaries (and their dispatch/DMA
    gaps) drop k-fold.
    """

    def micro_loss(params, micro_batch, dropout_rng):
        inputs = model_inputs(model_name, micro_batch)
        logits = model.apply({"params": params}, *inputs,
                             deterministic=False,
                             rngs={"dropout": dropout_rng})
        return loss_fn(logits, micro_batch["target"])

    grad_fn = jax.value_and_grad(micro_loss)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        """batch leaves are shaped (A, micro, ...)."""
        keys = jax.random.split(jax.random.fold_in(rng, state.step),
                                grad_accum)

        if grad_accum == 1:
            micro = jax.tree.map(lambda x: x[0], batch)
            loss, grads = grad_fn(state.params, micro, keys[0])
        elif accum_unroll:
            from bpx.parallel.sharding import constrain_like_params

            acc_dt = jnp.dtype(accum_dtype) if accum_dtype else jnp.float32
            loss, grads = grad_fn(state.params,
                                  jax.tree.map(lambda x: x[0], batch),
                                  keys[0])
            grads = constrain_like_params(
                jax.tree.map(lambda g: g.astype(acc_dt), grads))
            for i in range(1, grad_accum):
                li, gi = grad_fn(state.params,
                                 jax.tree.map(lambda x: x[i], batch),
                                 keys[i])
                grads = constrain_like_params(jax.tree.map(
                    lambda a, g: a + g.astype(acc_dt), grads, gi))
                loss = loss + li
            inv = 1.0 / grad_accum
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32) * inv, grads)
            loss = loss * inv
        else:
            from bpx.parallel.sharding import constrain_like_params

            acc_dt = jnp.dtype(accum_dtype) if accum_dtype else jnp.float32

            def body(carry, inp):
                grads_acc, loss_acc = carry
                micro, key = inp
                loss, grads = grad_fn(state.params, micro, key)
                grads_acc = jax.tree.map(
                    lambda a, g: a + g.astype(acc_dt), grads_acc, grads)
                # keep the scan-carried accumulators on the param layout —
                # XLA otherwise derives a permutation-inequivalent sharding
                # and full-rematerializes every carry element per iteration
                grads_acc = constrain_like_params(grads_acc)
                return (grads_acc, loss_acc + loss), None

            zero_grads = constrain_like_params(jax.tree.map(
                lambda p: jnp.zeros(p.shape, acc_dt), state.params))
            (grads, loss_sum), _ = jax.lax.scan(
                body, (zero_grads, jnp.zeros((), jnp.float32)),
                (batch, keys), unroll=accum_scan_unroll)
            inv = 1.0 / grad_accum
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32) * inv, grads)
            loss = loss_sum * inv

        mask = make_grad_mask(state.params, freeze_bert)
        if mask is not None:
            grads = jax.tree.map(jnp.multiply, grads, mask)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = {"loss": loss}
        if with_grad_norm:
            # opt-in: the full-tree norm re-reads every fp32 grad (~1.8 GB
            # on the moviescope model, ~8 ms/step) purely for the metric
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, model_name: str, loss_fn: Callable = None,
                   output_gates: bool = False):
    """Eval step: logits (+ GMU gates for the interpretability channel,
    ref: train.py:168-193).  ``loss_fn`` adds a device-side per-batch
    loss output; evaluate() recomputes the loss host-side over the
    valid-sliced concatenation instead, so its callers omit it and skip
    the wasted device compute."""

    def eval_step(params, batch: Dict[str, jax.Array]):
        inputs = model_inputs(model_name, batch)
        if output_gates:
            logits, gates = model.apply({"params": params}, *inputs,
                                        deterministic=True,
                                        output_gates=True)
        else:
            logits = model.apply({"params": params}, *inputs,
                                 deterministic=True)
            gates = None
        out = {"logits": logits}
        if loss_fn is not None:
            out["loss"] = loss_fn(logits, batch["target"])
        if gates is not None:
            out["gates"] = gates
        return out

    return eval_step


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState onto the mesh: params (and the matching adam
    moments) per the TP/FSDP rules, scalars replicated.  Once placed, a
    plain ``jax.jit`` step propagates the shardings — XLA inserts the
    collectives (scaling-book recipe: annotate inputs, let GSPMD work)."""
    p_sh = param_shardings(state.params, mesh)
    rep = replicated(mesh)
    placed_params = jax.device_put(state.params, p_sh)
    # Adam mu/nu inside the optimizer state mirror the param tree 1:1 and
    # get the same shardings; scalar leaves (count, injected lr) replicate.
    opt_placed = _place_opt_state(state.opt_state, p_sh, rep)
    return state.replace(step=jax.device_put(state.step, rep),
                         params=placed_params, opt_state=opt_placed)


def _place_opt_state(opt_state, p_sh, rep):
    """Place optimizer-state leaves: leaves whose subtree structure matches
    the param tree get param shardings, scalars replicate."""
    p_leaves, p_treedef = jax.tree_util.tree_flatten(p_sh)

    def place(node):
        try:
            leaves, treedef = jax.tree_util.tree_flatten(node)
            if treedef == p_treedef:
                return jax.device_put(node, p_sh)
        except Exception:
            pass
        return jax.device_put(node, rep)

    # opt_state is a (possibly nested) tuple of states; recurse through
    # plain tuples AND NamedTuple fields.  The recursion (not a one-shot
    # place() per field) matters: inject_hyperparams wraps the adam chain
    # as InjectHyperparamsState.inner_state = (ScaleByAdamState, ...), a
    # plain tuple whose whole-tree flatten never matches the param
    # treedef — flattening it whole silently replicated the Adam moments
    # on every chip (~2x param bytes of waste per chip under fsdp;
    # caught by the round-5 per-chip memory report).
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_place_opt_state(s, p_sh, rep) for s in opt_state)
    if hasattr(opt_state, "_fields"):   # NamedTuple state (e.g. ScaleByAdam)
        placed = {}
        for name in opt_state._fields:
            placed[name] = _place_opt_state(getattr(opt_state, name),
                                            p_sh, rep)
        return opt_state._replace(**placed)
    return place(opt_state)


def place_batch(batch, mesh: Mesh, has_accum_axis: bool):
    """Shard the micro-batch axis over (data, fsdp)."""
    axis = 1 if has_accum_axis else 0
    def sh(leaf):
        spec = [None] * leaf.ndim
        spec[axis] = ("data", "fsdp")
        return NamedSharding(mesh, P(*spec))
    return jax.tree.map(lambda x: jax.device_put(x, sh(x)), batch)
