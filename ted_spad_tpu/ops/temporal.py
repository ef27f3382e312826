"""Temporal feature pooling utilities for the anomaly stage.

The reference handles arbitrary-length videos not with sequence parallelism but by chopping
into clips and linearly pooling the clip sequence to a fixed 32 segments
(anomaly_detection_mgfn/utils/utils.py:34-42, SURVEY.md §5 long-context row). The fixed output
length is also what keeps MGFN training shapes static for XLA.
"""

from __future__ import annotations

import numpy as np


def scrambled_frame_view(video: np.ndarray) -> np.ndarray:
    """Reproduce the reference's fa-input layout quirk for A/B debugging (SURVEY.md §3.1 ⚠).

    train_anonymizer.py:87-92 permutes video to (B, C, T, H, W) and then reshapes to
    (B*T, C, H, W) *on the permuted tensor*, so each pseudo-image fed to fa holds 3
    consecutive same-channel time slices instead of an RGB frame. Given channels-last
    ``(B, T, H, W, C)`` video with T divisible by 3, returns the equivalent
    ``(B * T, H, W, 3)`` pseudo-frame batch: pseudo-frame k of sample b stacks channel
    ``k // T`` at times ``(3m, 3m+1, 3m+2)`` where ``m = k % T_groups`` — i.e. the
    time-slice bundles the reference's reshape produces. The rebuild trains on clean RGB
    frames (documented divergence); this view exists to reproduce reference feature
    tensors bit-for-bit when debugging against torch activations.

    The reference's ``reshape(-1, 3, H, W)`` groups the flattened (C, T) axis into
    3-slice bundles in linear order — when T % 3 != 0 (e.g. single 16-frame val
    clips, train_anonymizer.py:240-243) bundles STRADDLE channel boundaries; only
    C*T % 3 == 0 is required (always true for RGB)."""
    b, t, h, w, c = video.shape
    assert (c * t) % 3 == 0 and c == 3, "quirk view needs RGB input"
    # (B, T, H, W, C) -> (B, C, T, H, W): the reference's permute(0,2,1,3,4) equivalent.
    perm = np.transpose(video, (0, 4, 1, 2, 3))
    # reshape(-1, 3, H, W): 3-slice bundles in (C, T) linear order.
    bundles = perm.reshape(b * (c * t // 3), 3, h, w)
    return np.transpose(bundles, (0, 2, 3, 1))  # channels-last pseudo-frames


def unscrambled_frame_view(frames: np.ndarray, b: int, t: int) -> np.ndarray:
    """Exact inverse of :func:`scrambled_frame_view`: pseudo-frames ``(B*T, H, W, 3)``
    back to channels-last video ``(B, T, H, W, C)``."""
    n, h, w, _ = frames.shape
    assert n == b * t
    bundles = np.transpose(frames, (0, 3, 1, 2))  # (B*C*T/3, 3, H, W)
    perm = bundles.reshape(b, 3, t, h, w)  # (B, C, T, H, W)
    return np.transpose(perm, (0, 2, 3, 4, 1))


def scrambled_frame_view_jnp(video):
    """Jittable :func:`scrambled_frame_view` — the same quirk layout on-device, so
    ``quirk_compat`` stages reproduce reference fa-input tensors inside the compiled
    step (train_anonymizer.py:86-92)."""
    import jax.numpy as jnp

    b, t, h, w, c = video.shape
    assert (c * t) % 3 == 0 and c == 3, "quirk view needs RGB input"
    perm = jnp.transpose(video, (0, 4, 1, 2, 3))
    bundles = perm.reshape(b * (c * t // 3), 3, h, w)
    return jnp.transpose(bundles, (0, 2, 3, 1))


def unscrambled_frame_view_jnp(frames, b: int, t: int):
    """Jittable inverse of :func:`scrambled_frame_view_jnp`."""
    import jax.numpy as jnp

    n, h, w, _ = frames.shape
    bundles = jnp.transpose(frames, (0, 3, 1, 2))
    perm = bundles.reshape(b, 3, t, h, w)
    return jnp.transpose(perm, (0, 2, 3, 4, 1))


def extraction_return_scramble_jnp(frames, b: int, t: int):
    """The EXTRACTION-side quirk (dali_extraction.py:168-173): fa runs on clean
    ``(B*T, C, H, W)`` frames, but the return ``.reshape(B, C, T, H, W)`` reinterprets
    the (B, T, C)-ordered memory as (B, C, T) — so ft's channel c at time t reads
    frame ``(c*T + t) // 3``, channel ``(c*T + t) % 3``. Given channels-last clean fa
    output ``(B*T, H, W, C)``, returns the channels-last ``(B, T, H, W, C)`` tensor ft
    would see under the reference's scrambled reinterpretation."""
    import jax.numpy as jnp

    n, h, w, c = frames.shape
    assert n == b * t and c == 3
    mem = jnp.transpose(frames, (0, 3, 1, 2)).reshape(b, t * c, h, w)  # torch memory order
    perm = mem.reshape(b, c, t, h, w)  # the reference's reinterpreting reshape
    return jnp.transpose(perm, (0, 2, 3, 4, 1))


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
