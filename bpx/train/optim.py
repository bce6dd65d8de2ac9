"""Optimizer + LR scheduling (ref: train.py:123-136).

The reference uses plain ``optim.Adam`` with a ``ReduceLROnPlateau``
scheduler stepped on the epoch tuning metric.  Here:

* Adam via ``optax.inject_hyperparams`` so the learning rate is a leaf of the
  optimizer state that the host-side plateau scheduler rewrites between
  epochs without recompiling the train step;
* :class:`PlateauScheduler` — a pure-python port of ReduceLROnPlateau
  (mode min/max per task, ref: train.py:128-136) whose state is part of the
  checkpoint (ref: train.py:423-426 checkpoints scheduler state).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
import optax


def make_optimizer(lr: float,
                   name: str = "adam") -> optax.GradientTransformation:
    """Optimizer factory: plain Adam (ref: train.py:123-125) or the RAdam
    variants (ref: utils/optimization.py) — all with an injectable learning
    rate for the plateau scheduler."""
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if name == "adamw":
        # the demo notebooks' optimizer (DEMO_BPMultimodal… cell 60:
        # optim.AdamW(params, lr=args.lr) — torch defaults, so decoupled
        # weight decay 0.01 applied to every parameter)
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=0.01)
    if name == "radam":
        from bpx.train.radam import radam
        return radam(lr)
    if name == "plain_radam":
        from bpx.train.radam import plain_radam
        return plain_radam(lr)
    raise KeyError(f"unknown optimizer {name!r}")


def get_current_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Rewrite the injected learning rate in-place-functionally."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jax.numpy.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return opt_state._replace(hyperparams=hyper)


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau port (torch semantics, ref: train.py:128-136).

    ``mode='max'`` for classification/multilabel tasks, ``'min'`` for the
    cmu-mosi regression metric.
    """

    lr: float
    mode: str = "max"                # "min" | "max"
    factor: float = 0.5
    patience: int = 2
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: Optional[float] = None
    num_bad_epochs: int = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) \
                if self.best > 0 else metric > self.best + self.threshold
        return metric < self.best * (1.0 - self.threshold) \
            if self.best > 0 else metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Update with the epoch metric; returns the (possibly reduced) lr."""
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, state: dict):
        for k, v in state.items():
            setattr(self, k, v)


@dataclass
class EarlyStopping:
    """Early stopping on the tuning metric (ref: train.py:405-439).

    ``mode='min'`` for cmu-mosi (metric is MAE), else ``'max'``; improvement
    uses >= / <= like the reference (ref: train.py:409-412).
    """

    patience: int = 10
    mode: str = "max"
    best: float = float("-inf")
    n_no_improve: int = 0

    def __post_init__(self):
        if self.mode == "min" and self.best == float("-inf"):
            self.best = float("inf")

    def update(self, metric: float) -> bool:
        """Returns True when this epoch is an improvement."""
        metric = float(metric)
        improved = (metric <= self.best if self.mode == "min"
                    else metric >= self.best)
        if improved:
            self.best = metric
            self.n_no_improve = 0
        else:
            self.n_no_improve += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return self.n_no_improve >= self.patience

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, state: dict):
        for k, v in state.items():
            setattr(self, k, v)
