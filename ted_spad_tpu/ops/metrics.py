"""Evaluation metrics, implemented in numpy and validated against scikit-learn in tests.

Covers everything the reference computes:
  - frame-level ROC AUC / PR AUC for anomaly detection (anomaly_detection_mgfn/test.py:45-48),
  - macro average precision (= cMAP) + precision/recall/F1 for privacy attributes
    (privacy_training/train_privacy.py:104-119),
  - multi-view averaged top-1 accuracy for action recognition (train_action.py:347-376).

Pure numpy keeps these host-side (tiny data, after device reductions) with no sklearn runtime
dependency in the hot path.
"""

from __future__ import annotations

import numpy as np


def _binary_curve_counts(labels: np.ndarray, scores: np.ndarray):
    """Cumulative TP/FP counts at each distinct score threshold, descending score order."""
    labels = np.asarray(labels).astype(np.float64).ravel()
    scores = np.asarray(scores).astype(np.float64).ravel()
    order = np.argsort(-scores, kind="mergesort")
    scores = scores[order]
    labels = labels[order]
    # Indices of the last occurrence of each distinct score.
    distinct = np.where(np.diff(scores))[0]
    threshold_idx = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels)[threshold_idx]
    fps = 1 + threshold_idx - tps
    return tps, fps, scores[threshold_idx]


def roc_curve(labels: np.ndarray, scores: np.ndarray):
    """(fpr, tpr, thresholds) with sklearn conventions (leading (0,0) point)."""
    tps, fps, thr = _binary_curve_counts(labels, scores)
    tps = np.r_[0.0, tps]
    fps = np.r_[0.0, fps]
    thr = np.r_[np.inf, thr]
    p = tps[-1]
    n = fps[-1]
    tpr = tps / p if p > 0 else np.zeros_like(tps)
    fpr = fps / n if n > 0 else np.zeros_like(fps)
    return fpr, tpr, thr


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    fpr, tpr, _ = roc_curve(labels, scores)
    return float(np.trapezoid(tpr, fpr))


def precision_recall_curve(labels: np.ndarray, scores: np.ndarray):
    """(precision, recall, thresholds) with sklearn conventions (trailing (1,0) point)."""
    tps, fps, thr = _binary_curve_counts(labels, scores)
    p = tps[-1]
    precision = tps / np.maximum(tps + fps, 1)
    recall = tps / p if p > 0 else np.zeros_like(tps)
    # sklearn returns curves from high threshold to low, then appends precision=1, recall=0.
    precision = np.r_[precision[::-1], 1.0]
    recall = np.r_[recall[::-1], 0.0]
    return precision, recall, thr[::-1]


def pr_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Trapezoidal area under the PR curve — the reference uses ``auc(recall, precision)``
    (test.py:47-48), *not* average precision; match that choice."""
    precision, recall, _ = precision_recall_curve(labels, scores)
    # recall is descending; integrate in ascending order.
    return float(np.trapezoid(precision[::-1], recall[::-1]))


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """sklearn ``average_precision_score``: sum over thresholds of (dRecall * precision)."""
    tps, fps, _ = _binary_curve_counts(labels, scores)
    p = tps[-1]
    if p == 0:
        return 0.0
    precision = tps / np.maximum(tps + fps, 1)
    recall = tps / p
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def macro_average_precision(labels: np.ndarray, scores: np.ndarray) -> tuple[float, np.ndarray]:
    """cMAP over privacy attributes: per-class AP then unweighted mean
    (train_privacy.py:113-119). ``labels``/``scores``: (N, num_classes)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    per_class = np.array(
        [average_precision(labels[:, c], scores[:, c]) for c in range(labels.shape[1])]
    )
    return float(per_class.mean()), per_class


def multilabel_prf1(labels: np.ndarray, scores: np.ndarray, threshold: float = 0.5):
    """Macro precision / recall / F1 at a fixed threshold (train_privacy.py:104-112)."""
    labels = np.asarray(labels) > 0.5
    preds = np.asarray(scores) > threshold
    eps = 1e-12
    tp = (labels & preds).sum(0).astype(np.float64)
    fp = (~labels & preds).sum(0).astype(np.float64)
    fn = (labels & ~preds).sum(0).astype(np.float64)
    precision = tp / np.maximum(tp + fp, eps)
    recall = tp / np.maximum(tp + fn, eps)
    f1 = 2 * precision * recall / np.maximum(precision + recall, eps)
    return float(precision.mean()), float(recall.mean()), float(f1.mean())


def top1_accuracy(mean_probs: np.ndarray, labels: np.ndarray) -> float:
    """Top-1 after multi-view softmax averaging: ``mean_probs`` is (N, C) already averaged
    over modes/crops per video (train_action.py:347-376)."""
    return float((np.argmax(mean_probs, axis=1) == np.asarray(labels)).mean())


def frame_level_scores(
    clip_scores: np.ndarray, num_gt_frames: int, frames_per_clip: int = 32
) -> np.ndarray:
    """Expand per-clip anomaly scores to frame level (test.py:32-43).

    Each clip covers ``frames_per_clip`` original frames (16 frames at stride 2). If the
    expanded length mismatches the ground truth, redistribute by length ratio exactly as the
    reference's fallback.
    """
    pred = np.repeat(np.asarray(clip_scores, dtype=np.float32).ravel(), frames_per_clip)
    ratio = float(num_gt_frames) / float(len(pred))
    if ratio == 1.0:
        return pred
    final = np.zeros(num_gt_frames, dtype=np.float32)
    for i in range(len(pred)):
        b = int(i * ratio + 0.5)
        e = int((i + 1) * ratio + 0.5)
        final[b:e] = pred[i]
    return final
