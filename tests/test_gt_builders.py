"""GT builder unit tests against the reference's edge rules (make_gt_{ucf,sh,xd}.py)."""

import numpy as np
import pytest

from ted_spad_tpu.data.gt_builders import (
    build_gt,
    parse_xd_annotation_line,
    shanghai_video_gt,
    ucf_video_gt,
    xd_video_gt,
)


class TestUCF:
    def test_normal_video_zeroes(self):
        np.testing.assert_array_equal(ucf_video_gt(64, None), np.zeros(64))

    def test_single_event_inclusive_end(self):
        gt = ucf_video_gt(100, [(10, 19)])
        assert gt.sum() == 10  # [10, 19] inclusive (make_gt_ucf.py:55-59)
        assert gt[9] == 0 and gt[10] == 1 and gt[19] == 1 and gt[20] == 0
        assert len(gt) == 100

    def test_event_past_end_trims(self):
        # end+1 > num_frames path writes [start, end) then trims (make_gt_ucf.py:60-63).
        gt = ucf_video_gt(96, [(90, 130)])
        assert len(gt) == 96
        assert gt[89] == 0 and gt[90] == 1 and gt[95] == 1

    def test_two_events(self):
        gt = ucf_video_gt(200, [(10, 19), (100, 109)])
        assert gt.sum() == 20
        assert gt[50] == 0 and gt[105] == 1
        assert len(gt) == 200


class TestShanghai:
    def test_mask_strided_and_padded(self):
        mask = np.r_[np.zeros(20), np.ones(20), np.zeros(20)]  # 60 frames
        gt = shanghai_video_gt(48, mask)  # stride 2 -> 30, pad last value to 48
        assert len(gt) == 48
        assert gt[:10].sum() == 0 and gt[10:20].sum() == 10
        assert gt[30:].sum() == 0  # padded with last value (0)

    def test_mismatch_raises(self):
        with pytest.raises(ValueError):
            shanghai_video_gt(10, np.ones(100))


class TestXD:
    def test_parse_annotation_line(self):
        name, spans = parse_xd_annotation_line("vid.mp4 10 20 50 60")
        assert name == "vid.mp4"
        assert spans == [(10, 20), (50, 60)]

    def test_spans_end_exclusive_clipped(self):
        gt = xd_video_gt(64, [(10, 20), (60, 100)])
        assert gt[10] == 1 and gt[19] == 1 and gt[20] == 0
        assert gt[60:].sum() == 4  # clipped at 64
        assert len(gt) == 64


def test_build_gt_concatenates():
    videos = [
        {"num_clips": 2, "events": [(5, 14)]},
        {"num_clips": 1},
    ]
    gt = build_gt(videos, "UCF")
    assert len(gt) == 3 * 32
    assert gt[:64].sum() == 10 and gt[64:].sum() == 0
