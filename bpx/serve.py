"""Batch inference / serving.

The reference's only inference path is ``test()`` — a full eval pass wired to
the training CLI (ref: train.py:451-480).  For deployment, this module wraps
a trained checkpoint as a standalone predictor:

* one jitted forward, compiled once at construction (static shapes from the
  config — the same compilation contract as training);
* sigmoid/softmax post-processing per task type (ref: train.py:177-186);
* optional GMU gate outputs (the interpretability channel);
* ragged client batches padded to the compiled batch size and masked out.

Usage::

    predictor = Predictor.from_checkpoint(exp, "runs/moviescope/best_run")
    probs = predictor(batch_dict)                 # (B, n_classes)
    probs, gates = predictor(batch_dict, return_gates=True)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bpx.config import ExperimentConfig
from bpx.models import get_model
from bpx.train.steps import model_inputs
from bpx.train.state import TrainState
from bpx.train.optim import make_optimizer


class Predictor:
    def __init__(self, exp: ExperimentConfig, params, batch_size: int = 8):
        self.exp = exp
        self.model = get_model(exp.model)
        self.params = params
        self.batch_size = batch_size
        model_name = exp.model.model
        task = exp.data.task
        task_type = exp.data.task_type

        def forward(params, batch):
            inputs = model_inputs(model_name, batch)
            logits, gates = self.model.apply(
                {"params": params}, *inputs, deterministic=True,
                output_gates=True)
            if task_type == "multilabel" or task == "cmu-mosi":
                probs = jax.nn.sigmoid(logits)
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            return probs, gates

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, exp: ExperimentConfig, ckpt_dir: str,
                        example_batch: Dict[str, np.ndarray],
                        batch_size: int = 8, tag: str = "best"
                        ) -> "Predictor":
        """Restore the trained params from an orbax run directory."""
        from bpx.utils.checkpoint import CheckpointManager
        model = get_model(exp.model)
        inputs = model_inputs(exp.model.model,
                              {k: jnp.asarray(v[:1]) for k, v in
                               example_batch.items() if k != "valid"})
        params = model.init({"params": jax.random.PRNGKey(0)},
                            *inputs)["params"]
        state = TrainState.create(params, make_optimizer(exp.train.lr))
        ckpt = CheckpointManager(ckpt_dir)
        state, _ = ckpt.restore(state, tag)
        return cls(exp, state.params, batch_size)

    def __call__(self, batch: Dict[str, np.ndarray],
                 return_gates: bool = False):
        """Predict on a host batch of any size <= compiled batch size
        (smaller batches are padded and sliced)."""
        n = batch["txt"].shape[0]
        B = self.batch_size
        if n > B:
            raise ValueError(f"client batch {n} exceeds compiled size {B}")

        def pad(x):
            if x.shape[0] == B:
                return jnp.asarray(x)
            reps = np.concatenate(
                [x, np.repeat(x[-1:], B - x.shape[0], axis=0)], axis=0)
            return jnp.asarray(reps)

        padded = {k: pad(v) for k, v in batch.items() if k != "valid"}
        if "target" not in padded:
            # forward only needs model inputs; target unused
            pass
        probs, gates = self._forward(self.params, padded)
        probs = np.asarray(probs)[:n]
        if return_gates:
            return probs, np.asarray(gates)[:n]
        return probs
