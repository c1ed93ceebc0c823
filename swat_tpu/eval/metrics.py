"""Confusion matrix and per-class scores.

Matches the reference conventions exactly: confusion matrix rows are true
labels, columns predictions (torchmetrics ConfusionMatrix as used at
reference testing.py:417-458); `calculate_scores` mirrors
reference testing.py:134-186 including its key names and the
micro-vs-macro accuracy distinction.
"""

from __future__ import annotations

import numpy as np


def confusion_matrix_update(cm: np.ndarray, preds: np.ndarray,
                            labels: np.ndarray,
                            mask: np.ndarray | None = None) -> np.ndarray:
    """Accumulate [num_classes, num_classes] counts (rows=true, cols=pred)."""
    num_classes = cm.shape[0]
    if mask is not None:
        preds = preds[mask]
        labels = labels[mask]
    idx = labels.astype(np.int64) * num_classes + preds.astype(np.int64)
    cm += np.bincount(idx, minlength=num_classes * num_classes).reshape(
        num_classes, num_classes)
    return cm


def calculate_scores(confusion_matrix: np.ndarray) -> dict:
    """acc, avg_class_accuracy, per-class recall/precision/f1
    (reference testing.py:134-186)."""
    cm = np.asarray(confusion_matrix, dtype=np.float64)
    num_class = cm.shape[0]
    scores: dict = {}
    scores["acc"] = float(np.trace(cm) / np.sum(cm))
    # a class with zero true samples divides 0/0 -> NaN, and the NaN
    # propagates into avg_class_accuracy exactly like the reference
    # (testing.py:149-150) — substituting 0.0 would silently report a
    # finite average that counts the absent class as 0% accurate
    with np.errstate(divide="ignore", invalid="ignore"):
        class_accuracy = np.diag(cm) / cm.sum(axis=1)
    scores["avg_class_accuracy"] = float(class_accuracy.mean() * 100)

    recall, precision, f1 = {}, {}, {}
    for i in range(num_class):
        tp = cm[i, i]
        fn = cm[i, :].sum() - tp
        fp = cm[:, i].sum() - tp
        recall[i] = float(tp / (tp + fn)) if tp + fn > 0 else 0.0
        precision[i] = float(tp / (tp + fp)) if tp + fp > 0 else 0.0
        f1[i] = (2 * precision[i] * recall[i] / (precision[i] + recall[i])
                 if tp > 0 else 0)
    scores["per_class_recall"] = recall
    scores["per_class_precision"] = precision
    scores["per_class_f1score"] = f1
    return scores
