"""Train-state pytree.

The checkpointable device state: params, optimizer state, step counter.
Host-side loop state (epoch, early-stop counters, plateau scheduler) lives in
:mod:`bpx.train.loop` and is checkpointed alongside (ref: train.py:419-430
checkpoints epoch/state_dict/optimizer/scheduler/n_no_improve/best_metric).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))
