"""Vmapped multi-seed training.

The reference's seed sweep trains 5 seeds sequentially, one full process per
seed (ref: train.py:488-503); the SLURM task farm fans them over nodes.  On
TPU a third option exists (SURVEY.md §5.8): **vmap the whole train step over
a stacked-parameter axis**, training all seeds simultaneously on one chip —
the per-seed matmuls batch together on the MXU, so S small models cost far
less than S sequential runs.

Usage::

    states = init_multi_seed(exp, example_batch, seeds=[1, 2, 3, 4, 5])
    step = jax.jit(make_multi_seed_train_step(model, name, loss_fn, tx))
    states, metrics = step(states, batch, rngs)   # metrics["loss"]: (S,)

Every seed sees the same data order (the reference reshuffles per seed; for
sweep-style variance estimation the induced difference is the init/dropout
randomness, which this preserves per-seed).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from bpx.train.state import TrainState
from bpx.train.steps import model_inputs


def init_multi_seed(model, model_name: str, example_batch, tx,
                    seeds: Sequence[int]) -> TrainState:
    """Stack per-seed params into one TrainState with a leading seed axis."""
    inputs = model_inputs(model_name, example_batch)

    def init_one(seed):
        params = model.init({"params": jax.random.PRNGKey(seed)},
                            *inputs)["params"]
        return params

    stacked = jax.vmap(init_one)(jnp.asarray(list(seeds)))
    # optimizer state per seed mirrors the stacked params
    opt_state = jax.vmap(tx.init)(stacked)
    return TrainState(step=jnp.zeros((len(seeds),), jnp.int32),
                      params=stacked, opt_state=opt_state)


def make_multi_seed_train_step(model, model_name: str, loss_fn: Callable,
                               tx):
    """vmap of a single-seed train step over the stacked state axis.

    ``batch`` is shared across seeds (broadcast); ``rngs`` is one dropout
    key per seed.
    """
    import optax

    def one_step(state: TrainState, batch, rng):
        def micro_loss(params):
            logits = model.apply({"params": params},
                                 *model_inputs(model_name, batch),
                                 deterministic=False,
                                 rngs={"dropout": rng})
            return loss_fn(logits, batch["target"])

        loss, grads = jax.value_and_grad(micro_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), {"loss": loss}

    return jax.vmap(one_step, in_axes=(0, None, 0))


def unstack_seed(state: TrainState, index: int) -> TrainState:
    """Extract one seed's TrainState (e.g. for checkpointing the best)."""
    take = lambda x: x[index]
    return TrainState(step=take(state.step),
                      params=jax.tree.map(take, state.params),
                      opt_state=jax.tree.map(take, state.opt_state))
