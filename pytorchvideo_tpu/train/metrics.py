"""Evaluation metrics.

The reference instantiates torchmetrics Accuracy / AveragePrecision from
conf (module/video_classification.py:117-123). jnp equivalents: top-k
accuracy and (multi-label) mean average precision — the model-zoo parity
metrics for Kinetics / Charades / AVA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def topk_accuracy(logits, labels, k: int = 1) -> jnp.ndarray:
    """Fraction of samples whose label is within the top-k scores."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    topk = jnp.argsort(logits, axis=-1)[:, -k:]
    return jnp.mean(jnp.any(topk == labels[:, None], axis=-1).astype(jnp.float32))


def top1_top5(logits, labels):
    return {
        "top1": float(topk_accuracy(logits, labels, 1)),
        "top5": float(topk_accuracy(logits, labels, 5)),
    }


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """AP for one class: area under the precision-recall curve
    (torchmetrics/sklearn-style step integration)."""
    scores = np.asarray(scores, np.float64)
    targets = np.asarray(targets).astype(bool)
    if targets.sum() == 0:
        return float("nan")
    order = np.argsort(-scores)
    tp = targets[order]
    cum_tp = np.cumsum(tp)
    precision = cum_tp / (np.arange(len(tp)) + 1)
    recall = cum_tp / targets.sum()
    # sum precision at each positive hit / num positives
    return float((precision * tp).sum() / targets.sum())


def mean_average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """Macro mAP over classes for multi-label (N, C) scores/targets
    (Charades/AVA-style), ignoring classes with no positives."""
    scores = np.asarray(scores)
    targets = np.asarray(targets)
    aps = [
        average_precision(scores[:, c], targets[:, c])
        for c in range(scores.shape[1])
    ]
    aps = [a for a in aps if not np.isnan(a)]
    return float(np.mean(aps)) if aps else 0.0
