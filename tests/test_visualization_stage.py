"""Visualization stage e2e (reference: visualization/visualize_anonymization.py:65-115):
whole-video anonymize -> mp4 artifact (decodable by our own reader) + before/after grid."""

import numpy as np
import pytest
from PIL import Image

from ted_spad_tpu.data.video_reader import native_available, open_video
from ted_spad_tpu.stages.visualization import anonymize_video


def test_anonymize_video_artifacts(tmp_path):
    uri = "synthetic://n=24,h=48,w=64,seed=0"
    res = anonymize_video(
        uri, str(tmp_path), size=(48, 64), chunk=8, sample_grid_frames=3
    )
    # Grid: original row over anonymized row, 3 frames wide.
    grid = np.asarray(Image.open(res["grid"]))
    assert grid.shape == (96, 192, 3)
    # The anonymized half must differ from the original half (fa is not identity
    # at random init).
    assert not np.array_equal(grid[:48], grid[48:])

    if native_available():
        assert res["video"].endswith(".mp4")
        with open_video(res["video"]) as vr:
            frames = vr.read_strided(0, 24, 1)
        assert frames.shape == (24, 48, 64, 3)
        # Encoded anonymized frames resemble the grid's anonymized row at the
        # sampled index (lossy codec -> loose tolerance, but not garbage).
        anon_row0 = grid[48:, :64].astype(np.int16)
        got0 = frames[0].astype(np.int16)
        assert np.abs(anon_row0 - got0).mean() < 16.0
    else:
        assert res["video"].endswith(".y4m")
