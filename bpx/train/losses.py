"""Loss functions (ref: train.py:99-120 ``get_criterion``).

Per-task criteria, as pure jittable functions:

* multilabel  -> BCE-with-logits, optionally with inverse-frequency per-class
  ``pos_weight`` (ref: train.py:100-106);
* classification -> cross-entropy, optionally with inverse-frequency class
  weights and torch's weighted-mean normalisation (ref: train.py:108-111);
* cmu-mosi    -> L1 regression (ref: train.py:113-114), with the soft-binned
  target transform from model_forward (ref: train.py:323-326) applied in the
  data adapter.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def inverse_frequency_weights(label_freqs: Sequence[float],
                              train_data_len: int) -> np.ndarray:
    """``(freq / N) ** -1`` per class (ref: train.py:102-103)."""
    freqs = np.asarray(label_freqs, dtype=np.float64)
    return np.asarray((freqs / float(train_data_len)) ** -1,
                      dtype=np.float32)


def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    pos_weight: Optional[jax.Array] = None) -> jax.Array:
    """Mean BCE over all elements; matches torch BCEWithLogitsLoss semantics:
    ``pos_weight`` scales only the positive term."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pos = targets * log_p
    if pos_weight is not None:
        pos = pos * pos_weight
    return -jnp.mean(pos + (1.0 - targets) * log_not_p)


def weighted_cross_entropy(logits: jax.Array, targets: jax.Array,
                           class_weights: Optional[jax.Array] = None
                           ) -> jax.Array:
    """CE with torch's weighted-mean reduction:
    ``sum_i w_{y_i} * nll_i / sum_i w_{y_i}``."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[targets]
    return jnp.sum(w * nll) / jnp.sum(w)


def l1_loss(preds: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(preds.astype(jnp.float32)
                            - targets.astype(jnp.float32)))


def make_loss_fn(task: str, task_type: str,
                 weight_classes: bool = True,
                 label_freqs: Optional[Sequence[float]] = None,
                 train_data_len: Optional[int] = None
                 ) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build the per-task loss (ref: train.py:99-120)."""
    weights = None
    if (weight_classes and task != "cmu-mosi" and label_freqs is not None
            and train_data_len):
        weights = jnp.asarray(
            inverse_frequency_weights(label_freqs, train_data_len))

    if task_type == "multilabel":
        pw = weights

        def loss_fn(logits, targets):
            return bce_with_logits(logits, targets, pw)
        return loss_fn

    if task == "cmu-mosi":
        def loss_fn(logits, targets):
            # (B, 1) regression head squeezed (ref: train.py:330).
            return l1_loss(logits[:, 0], targets)
        return loss_fn

    cw = weights

    def loss_fn(logits, targets):
        return weighted_cross_entropy(logits, targets, cw)
    return loss_fn
