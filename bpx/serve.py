"""Batch inference / serving.

The reference's only inference path is ``test()`` — a full eval pass wired to
the training CLI (ref: train.py:451-480).  For deployment, this module wraps
a trained checkpoint as a standalone predictor:

* one jitted forward, compiled once at construction (static shapes from the
  config — the same compilation contract as training);
* sigmoid/softmax post-processing per task type (ref: train.py:177-186);
* optional GMU gate outputs (the interpretability channel);
* ragged client batches padded to the compiled batch size and masked out;
* AOT deployment: :meth:`Predictor.export` serializes the forward (trained
  params baked in as StableHLO constants) via ``jax.export``, and
  :class:`ExportedPredictor` serves the artifact without model code,
  config, or checkpoint — only jax and the bytes.

Usage::

    predictor = Predictor.from_checkpoint(exp, "runs/moviescope/best_run")
    probs = predictor(batch_dict)                 # (B, n_classes)
    probs, gates = predictor(batch_dict, return_gates=True)

    predictor.export(batch_dict, "model.bpx")     # build-time
    server = ExportedPredictor.load("model.bpx")  # deploy-time
    probs = server(batch_dict)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bpx.config import ExperimentConfig
from bpx.models import get_model
from bpx.train.steps import model_inputs
from bpx.train.state import TrainState
from bpx.train.optim import make_optimizer


def _padded_call(fn, batch: Dict[str, np.ndarray], batch_size: int,
                 return_gates: bool):
    """Shared host-side serving contract: pad a ragged client batch to the
    compiled batch size (repeating the last row), run ``fn(batch) ->
    (probs, gates)``, slice back to the client rows."""
    n = batch["txt"].shape[0]
    B = batch_size
    if n > B:
        raise ValueError(f"client batch {n} exceeds compiled size {B}")

    def pad(x):
        if x.shape[0] == B:
            return jnp.asarray(x)
        reps = np.concatenate(
            [x, np.repeat(x[-1:], B - x.shape[0], axis=0)], axis=0)
        return jnp.asarray(reps)

    padded = {k: pad(v) for k, v in batch.items() if k != "valid"}
    probs, gates = fn(padded)
    probs = np.asarray(probs)[:n]
    if return_gates:
        return probs, np.asarray(gates)[:n]
    return probs


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

        self._forward_fn = forward
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

    def _specs(self, example_batch: Dict[str, np.ndarray]):
        """ShapeDtypeStructs of the padded device batch (leading dim is
        the compiled batch size, feature dims from the example)."""
        out = {}
        for k, v in example_batch.items():
            if k == "valid":
                continue
            v = np.asarray(v)
            out[k] = jax.ShapeDtypeStruct((self.batch_size,) + v.shape[1:],
                                          v.dtype)
        return out

    def warmup(self, example_batch: Dict[str, np.ndarray]) -> None:
        """Compile the forward before serving traffic (AOT, no execution):
        first-request latency becomes dispatch-only."""
        self._forward.lower(self.params, self._specs(example_batch)).compile()

    def export(self, example_batch: Dict[str, np.ndarray],
               path: Optional[str] = None,
               platforms: Optional[Sequence[str]] = None) -> bytes:
        """Serialize the serving forward as a ``jax.export`` StableHLO
        artifact, trained params baked in as constants.

        The artifact is self-contained for deployment: reloading needs
        only jax (:class:`ExportedPredictor`), not the model code, the
        config tree, or the checkpoint.  Post-processing (sigmoid /
        softmax, gate outputs) is traced into the module; the host-side
        pad/slice contract is reproduced by the wrapper.  ``platforms``
        lowers for other backends (e.g. export on a CPU host for
        ``["tpu"]``); default is the current backend.
        """
        from jax import export as jexport

        params = self.params
        fn = jax.jit(lambda batch: self._forward_fn(params, batch))
        exported = jexport.export(fn, platforms=platforms)(
            self._specs(example_batch))
        blob = exported.serialize()
        if path is not None:
            with open(path, "wb") as f:
                f.write(blob)
        return blob

    def __call__(self, batch: Dict[str, np.ndarray],
                 return_gates: bool = False):
        """Predict on a host batch of any size <= compiled batch size
        (smaller batches are padded and sliced)."""
        return _padded_call(lambda b: self._forward(self.params, b),
                            batch, self.batch_size, return_gates)


class ExportedPredictor:
    """Serve a :meth:`Predictor.export` artifact.

    Deployment needs only jax and the artifact bytes — the trained params
    travel inside the StableHLO module as constants and the task's
    post-processing was traced in at export time.  The host-side contract
    (pad ragged client batches to the compiled size, slice back) matches
    :class:`Predictor` exactly.
    """

    def __init__(self, blob: bytes):
        from jax import export as jexport
        self._exported = jexport.deserialize(bytearray(blob))
        # every model input carries the compiled batch as its leading dim
        self.batch_size = self._exported.in_avals[0].shape[0]
        self._call = jax.jit(self._exported.call)

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        with open(path, "rb") as f:
            return cls(f.read())

    def __call__(self, batch: Dict[str, np.ndarray],
                 return_gates: bool = False):
        return _padded_call(self._call, batch, self.batch_size,
                            return_gates)
