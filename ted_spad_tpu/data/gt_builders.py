"""Frame-level ground-truth builders for the anomaly benchmarks.

Reference: anomaly_detection_mgfn/data/make_gt_ucf.py, make_gt_sh.py, make_gt_xd.py.
These are host-side numpy utilities (no device work); rebuilt as pure functions over
parsed annotations so they are unit-testable without the datasets on disk.

Per-dataset conventions (SURVEY.md §2.2 GT builders row):
  - UCF-Crime: temporal .mat annotations with 1-2 [start, end] events per abnormal video;
    num_frames = num_clips * 32 (make_gt_ucf.py:25); events clipped/extended per the
    reference's edge rules (:38-95); small positive remainder (<64) trimmed (:98-108).
  - ShanghaiTech: per-video frame masks subsampled at stride 2 then last-frame padded to
    num_clips * 16 (make_gt_sh.py:32, 50-62); first 44 list entries are abnormal.
  - XD-Violence: annotations.txt multi-span "name s1 e1 s2 e2 ..." lines; num_frames =
    num_clips * 32 (make_gt_xd.py:26, 34-56); first 300 entries are normal.
"""

from __future__ import annotations

import numpy as np


def ucf_video_gt(num_frames: int, events: list[tuple[int, int]] | None) -> np.ndarray:
    """One UCF video's frame labels. ``events``: up to two (start, end) frame indices
    (inclusive), or None for a normal video (make_gt_ucf.py:33-95).

    Matches the reference's quirky edge handling: an event whose ``end+1`` exceeds
    ``num_frames`` is written as [start, end) and the trailing normal span is skipped —
    the resulting over-length is trimmed by the caller if < 64 (make_gt_ucf.py:98-108).
    """
    gt: list[float] = []
    if not events:
        return np.zeros(num_frames, dtype=float)
    cursor = 0
    for start, end in events:
        gt.extend([0.0] * (start - cursor))
        if end + 1 > num_frames:
            gt.extend([1.0] * (end - start))
            cursor = end
            return _trim(np.asarray(gt, dtype=float), num_frames, max_fix=64)
        gt.extend([1.0] * (end + 1 - start))
        cursor = end + 1
    gt.extend([0.0] * (num_frames - cursor))
    return _trim(np.asarray(gt, dtype=float), num_frames, max_fix=64)


def shanghai_video_gt(num_frames: int, frame_mask: np.ndarray | None) -> np.ndarray:
    """One ShanghaiTech video's labels: mask strided by 2 then last-value padded to
    num_frames (= num_clips*16, make_gt_sh.py:32-62). Normal videos -> zeros."""
    if frame_mask is None:
        return np.zeros(num_frames, dtype=float)
    anno = np.asarray(frame_mask)[::2].astype(float)
    if len(anno) < num_frames:
        anno = np.concatenate([anno, np.full(num_frames - len(anno), anno[-1])])
    if len(anno) != num_frames:
        raise ValueError(f"frame mask length {len(anno)} != expected {num_frames}")
    return anno


def xd_video_gt(num_frames: int, spans: list[tuple[int, int]] | None) -> np.ndarray:
    """One XD-Violence video's labels from (start, end) spans — end exclusive, clipped to
    num_frames (make_gt_xd.py:40-56). Normal videos -> zeros."""
    if not spans:
        return np.zeros(num_frames, dtype=float)
    gt: list[float] = []
    cursor = 0
    end = 0
    for start, end in spans:
        gt.extend([0.0] * (start - cursor))
        end = min(end, num_frames)
        gt.extend([1.0] * (end - start))
        cursor = end
    gt.extend([0.0] * (num_frames - end))
    return _trim(np.asarray(gt, dtype=float), num_frames, max_fix=16)


def _trim(gt: np.ndarray, num_frames: int, max_fix: int) -> np.ndarray:
    """Length-repair: drop a small positive remainder, else fail loudly
    (make_gt_ucf.py:98-108; make_gt_xd.py:59-69)."""
    remainder = len(gt) - num_frames
    if remainder == 0:
        return gt
    if 0 < remainder < max_fix:
        return gt[:-remainder]
    raise ValueError(f"gt length {len(gt)} != num_frames {num_frames} (remainder {remainder})")


def parse_xd_annotation_line(line: str) -> tuple[str, list[tuple[int, int]]]:
    """'name s1 e1 s2 e2 ...' -> (name, [(s1, e1), ...]) (make_gt_xd.py:36-40)."""
    parts = line.split()
    name = parts[0]
    nums = [int(x) for x in parts[1:]]
    return name, list(zip(nums[::2], nums[1::2]))


def build_gt(
    videos: list[dict],
    dataset: str,
    frames_per_clip: int | None = None,
) -> np.ndarray:
    """Concatenate per-video GT for a test list.

    ``videos``: list of {'num_clips': int, 'events'/'spans'/'frame_mask': ...} in test-list
    order. ``frames_per_clip`` defaults to 32 (UCF/XD) or 16 (ST).
    """
    if frames_per_clip is None:
        frames_per_clip = 16 if dataset == "ST" else 32
    builders = {"UCF": ucf_video_gt, "ST": shanghai_video_gt, "XD": xd_video_gt}
    keys = {"UCF": "events", "ST": "frame_mask", "XD": "spans"}
    build = builders[dataset]
    key = keys[dataset]
    parts = [build(v["num_clips"] * frames_per_clip, v.get(key)) for v in videos]
    return np.concatenate(parts)
