"""Segmentation metrics.

Device side: per-batch confusion counts (TP/FP/FN/TN) computed on device so
only four scalars cross to the host per step — replacing the reference's
per-step full-tensor ``.cpu()`` sync (/root/reference/utils/trainer.py
:101-104). Host side: the same IoU / accuracy / P / R / F1 formulas as
/root/reference/utils/utils.py:225-251 and the global micro-averaged test
metrics of /root/reference/utils/trainer.py:232-250.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ConfusionCounts(NamedTuple):
    """Pixel confusion counts under the reference's TWO target-binarization
    conventions (they differ once targets are soft — bilinear-resized masks
    or mixup labels):

    - ``tp/fp/fn/tn``: **int truncation** (numpy ``astype(int)``): a target
      pixel is positive iff t >= 1, else negative. Used by the reference's
      acc/precision/recall/F1 epoch metrics and by ALL test() metrics.
    - ``inter/union``: **bool** (numpy ``astype(bool)``): positive iff
      t > 0. Used by the reference's epoch IoU (the model-selection metric).
    """

    tp: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray
    tn: jnp.ndarray
    inter: jnp.ndarray
    union: jnp.ndarray

    def __add__(self, other):
        return ConfusionCounts(*(a + b for a, b in zip(self, other)))


def confusion_counts(logits: jnp.ndarray, targets: jnp.ndarray,
                     threshold: float = 0.5,
                     per_image: bool = False) -> ConfusionCounts:
    """Device-side confusion counts; pred = sigmoid(logits) > threshold.

    ``per_image=True`` reduces over the spatial/channel axes only, so each
    count is a (batch,)-vector — the per-image audit rows written by
    ``Trainer.test()``. Their sums equal the global (scalar) counts."""
    axes = tuple(range(1, logits.ndim)) if per_image else None
    pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold)
    t = targets.astype(jnp.float32)
    pos_i = t >= 1.0   # astype(int) truncation semantics on [0, 1] floats
    pos_b = t > 0.0    # astype(bool) semantics
    f32 = jnp.float32
    tp = jnp.sum((pred & pos_i).astype(f32), axis=axes)
    fp = jnp.sum((pred & ~pos_i).astype(f32), axis=axes)
    fn = jnp.sum((~pred & pos_i).astype(f32), axis=axes)
    tn = jnp.sum((~pred & ~pos_i).astype(f32), axis=axes)
    inter = jnp.sum((pred & pos_b).astype(f32), axis=axes)
    union = jnp.sum((pred | pos_b).astype(f32), axis=axes)
    return ConfusionCounts(tp, fp, fn, tn, inter, union)


def metrics_from_counts(tp, fp, fn, tn, eps: float = 1e-8) -> dict:
    """Global micro-averaged pixel metrics (reference test() formulas)."""
    tp, fp, fn, tn = (float(x) for x in (tp, fp, fn, tn))
    acc = (tp + tn) / (tp + tn + fp + fn + eps)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    iou = tp / (tp + fp + fn + eps)
    return {"acc": acc, "precision": precision, "recall": recall,
            "f1": f1, "iou": iou, "tp": tp, "fp": fp, "fn": fn, "tn": tn}


# ---- numpy equivalents (train/val epoch metrics in the reference use
# slightly different zero-guards than test(); reproduced faithfully) ----

def calculate_iou(pred: np.ndarray, target: np.ndarray) -> float:
    pred = pred.astype(bool)
    target = target.astype(bool)
    inter = np.logical_and(pred, target).sum()
    union = np.logical_or(pred, target).sum()
    return float(inter / union) if union > 0 else float("nan")


def calculate_acc(pred: np.ndarray, target: np.ndarray) -> float:
    return float((pred.astype(int) == target.astype(int)).mean())


def calculate_precision_recall_f1(pred: np.ndarray, target: np.ndarray):
    pred = pred.astype(int)
    target = target.astype(int)
    tp = np.logical_and(pred == 1, target == 1).sum()
    fp = np.logical_and(pred == 1, target == 0).sum()
    fn = np.logical_and(pred == 0, target == 1).sum()
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return float(precision), float(recall), float(f1)


def epoch_metrics_from_counts(counts: ConfusionCounts) -> dict:
    """Train/val epoch metrics from accumulated device counts, reproducing
    the reference's guard conventions: acc/P/R/F1 from the int-truncation
    counts (0.0 on empty denominators), IoU from the bool inter/union."""
    tp, fp, fn, tn, inter, union = (float(x) for x in counts)
    total = tp + fp + fn + tn
    acc = (tp + tn) / total if total > 0 else 0.0
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    iou = inter / union if union > 0 else float("nan")
    return {"acc": acc, "precision": precision, "recall": recall,
            "f1": f1, "iou": iou}
