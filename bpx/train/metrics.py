"""Per-task evaluation metrics (ref: train.py:138-280 ``model_eval``).

Host-side numpy/sklearn, computed from stacked logits.  Keys keep the
reference names so downstream tooling (tuning-metric selection, log format)
is drop-in; where the reference mislabels a quantity (mmimdb's "micro_f1" is
actually AP-micro etc., ref: train.py:206-211) we compute the *reference
quantity under the reference key* for parity and add honestly-named
duplicates.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    f1_score,
)


def weighted_acc(preds: np.ndarray, truths: np.ndarray):
    """Class-balanced accuracy + F1 for one binary label
    (ref: train.py:138-163)."""
    preds = np.asarray(preds).astype(np.int64)
    truths = np.asarray(truths).astype(np.int64)
    n = int((truths == 0).sum())
    p = int((truths == 1).sum())
    tn = int(((truths == 0) & (preds == 0)).sum())
    tp = int(((truths == 1) & (preds == 1)).sum())
    if p == 0 or n == 0:
        w_acc = float("nan")
    else:
        w_acc = (tp * n / p + tn) / (2 * n)
    fp, fn = n - tn, p - tp
    recall = tp / (tp + fn + 1e-8)
    precision = tp / (tp + fp + 1e-8)
    f1 = 2 * recall * precision / (recall + precision + 1e-8)
    return w_acc, f1


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def compute_metrics(task: str, task_type: str,
                    logits: np.ndarray, targets: np.ndarray,
                    losses: Optional[np.ndarray] = None,
                    loss_weights: Optional[np.ndarray] = None
                    ) -> Dict[str, float]:
    """Stacked (N, C) logits + targets -> metric dict (ref: train.py:195-270).

    ``loss_weights`` (per-batch valid-sample counts) excludes wrap-padded
    rows of the final partial batch from the reported mean loss.
    """
    metrics: Dict[str, float] = {}
    if losses is not None:
        metrics["loss"] = float(np.average(losses, weights=loss_weights))

    if task_type == "multilabel":
        raw = _sigmoid(logits)
        preds = raw > 0.5
        tgts = targets.astype(np.int64)
        if task == "moviescope":
            metrics["macro_f1"] = f1_score(tgts, preds, average="macro",
                                           zero_division=0)
            metrics["micro_f1"] = f1_score(tgts, preds, average="micro",
                                           zero_division=0)
            metrics["auc_pr_macro"] = average_precision_score(
                tgts, raw, average="macro")
            metrics["auc_pr_micro"] = average_precision_score(
                tgts, raw, average="micro")
            metrics["auc_pr_samples"] = average_precision_score(
                tgts, raw, average="samples")
        elif task == "mmimdb":
            # Reference-compat keys (quantities as computed at
            # train.py:206-211) plus honest names.
            metrics["macro_f1"] = f1_score(tgts, preds, average="macro",
                                           zero_division=0)
            metrics["micro_f1"] = average_precision_score(tgts, raw,
                                                          average="micro")
            metrics["auc_pr_macro"] = f1_score(tgts, preds,
                                               average="weighted",
                                               zero_division=0)
            metrics["auc_pr_micro"] = f1_score(tgts, preds, average="micro",
                                               zero_division=0)
            metrics["auc_pr_samples"] = f1_score(tgts, preds,
                                                 average="samples",
                                                 zero_division=0)
            # honest duplicates
            metrics["true_micro_f1"] = metrics["auc_pr_micro"]
            metrics["true_auc_pr_micro"] = metrics["micro_f1"]
            metrics["weighted_f1"] = metrics["auc_pr_macro"]
        elif task == "counseling":
            per_class = f1_score(tgts, preds, average=None, zero_division=0)
            metrics["acc"] = accuracy_score(tgts, preds)
            metrics["auc_pr_micro"] = average_precision_score(
                tgts, raw, average="micro")
            f1s, accs = [], []
            for i in range(2):
                wacc, f1 = weighted_acc(preds[:, i], tgts[:, i])
                accs.append(wacc)
                f1s.append(f1)
            metrics["f1_low"] = f1s[1]
            metrics["f1_high"] = f1s[0]
        elif task == "cmu-mosei":
            n_emo = tgts.shape[1]
            accs, f1s = [], []
            for i in range(n_emo):
                wacc, f1 = weighted_acc(preds[:, i], tgts[:, i])
                accs.append(wacc)
                f1s.append(f1)
            for i in range(n_emo):
                metrics[f"f1_emo{i + 1}"] = f1s[i]
                metrics[f"wacc_emo{i + 1}"] = accs[i]
            metrics["f1_emos"] = float(np.nanmean(f1s))
            metrics["wacc_emos"] = average_precision_score(
                tgts, raw, average="micro")
            metrics["auc_pr_micro"] = float(np.nanmean(accs))
        else:   # iemocap and other multilabel tasks: the moviescope set
            metrics["macro_f1"] = f1_score(tgts, preds, average="macro",
                                           zero_division=0)
            metrics["micro_f1"] = f1_score(tgts, preds, average="micro",
                                           zero_division=0)
            metrics["auc_pr_macro"] = average_precision_score(
                tgts, raw, average="macro")
            metrics["auc_pr_micro"] = average_precision_score(
                tgts, raw, average="micro")
    else:
        # cmu-mosi regression (ref: train.py:257-270): sigmoid preds are
        # mapped to [-3, 3] via *6-3.
        raw = _sigmoid(logits[:, 0])
        tgts = targets.astype(np.float64).reshape(-1)
        predict = raw * 6.0 - 3.0
        metrics["mae"] = float(np.mean(np.abs(predict - tgts)))
        if np.std(predict) > 0 and np.std(tgts) > 0:
            metrics["corr"] = float(np.corrcoef(predict, tgts)[0][1])
        else:
            metrics["corr"] = 0.0
        metrics["accuracy_7"] = float(
            np.mean(np.round(predict) == np.round(tgts)))
        non_zeros = tgts != 0
        if non_zeros.any():
            bt = tgts[non_zeros] > 0
            bp = predict[non_zeros] > 0
            metrics["weighted_f1"] = f1_score(bp, bt, average="weighted",
                                              zero_division=0)
            metrics["accuracy_2"] = accuracy_score(bt, bp)
        metrics["weight_f1"] = metrics["mae"]   # tuning metric alias
    return metrics


def tuning_metric(task: str, task_type: str,
                  metrics: Dict[str, float]) -> float:
    """The epoch tuning metric (ref: train.py:405-407)."""
    if task_type == "multilabel":
        return metrics["auc_pr_micro"]
    return metrics["weight_f1"]


def log_metrics(prefix: str, metrics: Dict[str, float], task: str,
                logger) -> None:
    """Formatted per-task metric lines (ref: utils/utils.py:83-120)."""
    ordered = sorted(metrics.items())
    line = " | ".join(f"{k}: {v:.4f}" for k, v in ordered
                      if isinstance(v, (int, float)) and np.isfinite(v))
    logger.info("%s — %s", prefix, line)
