"""Temporal feature pooling utilities for the anomaly stage.

The reference handles arbitrary-length videos not with sequence parallelism but by chopping
into clips and linearly pooling the clip sequence to a fixed 32 segments
(anomaly_detection_mgfn/utils/utils.py:34-42, SURVEY.md §5 long-context row). The fixed output
length is also what keeps MGFN training shapes static for XLA.
"""

from __future__ import annotations

import numpy as np


def process_feat(feat: np.ndarray, length: int = 32) -> np.ndarray:
    """Linear segment mean-pooling of a (T, F) feature sequence to (length, F)
    (utils/utils.py:34-42). Segment boundaries via integer linspace; empty segments copy the
    boundary row."""
    feat = np.asarray(feat, dtype=np.float32)
    t = feat.shape[0]
    out = np.zeros((length, feat.shape[1]), dtype=np.float32)
    r = np.linspace(0, t, length + 1, dtype=int)
    for i in range(length):
        if r[i] != r[i + 1]:
            out[i] = feat[r[i] : r[i + 1]].mean(axis=0)
        else:
            out[i] = feat[min(r[i], t - 1)]
    return out


def append_magnitude(features: np.ndarray) -> np.ndarray:
    """Concatenate the per-snippet L2 magnitude as feature 2049 (datasets/dataset.py:72-73,
    96-99). ``features``: (..., T, F) -> (..., T, F+1)."""
    mag = np.linalg.norm(features, axis=-1, keepdims=True)
    return np.concatenate([features, mag], axis=-1).astype(np.float32)


def segment_train_features(features: np.ndarray, seg_length: int = 32) -> np.ndarray:
    """Training-time transform (datasets/dataset.py:86-100): per-crop 32-segment pooling plus
    magnitude channel. ``features``: (T, F) or (T, ncrops, F) -> (ncrops, seg_length, F+1)."""
    features = np.asarray(features, dtype=np.float32)
    if features.ndim < 3:
        features = features[:, None, :]  # single-crop
    features = features.transpose(1, 0, 2)  # (ncrops, T, F)
    pooled = np.stack([process_feat(f, seg_length) for f in features])
    return append_magnitude(pooled)


def test_features(features: np.ndarray) -> np.ndarray:
    """Test-time transform (datasets/dataset.py:68-84): full-length sequence plus magnitude.
    ``features``: (T, F) or (T, ncrops, F) -> (T, ncrops, F+1)."""
    features = np.asarray(features, dtype=np.float32)
    if features.ndim < 3:
        features = features[:, None, :]
    return append_magnitude(features)
