"""Native video decode layer tests (decord/DALI/cv2 replacement, SURVEY.md §2.3).

Fixtures are pure-python Y4M files; the writer emits full-range YCbCr and tags the
stream XCOLORRANGE=FULL — the decoder honors the tag (to_rgb keys its swscale context
on the frame's colorimetry), so gray value v decodes back to exactly v. (Before the
tag was honored, swscale's studio-range default mis-expanded these fixtures.)"""

import numpy as np
import pytest

from ted_spad_tpu.data.video_reader import (
    SyntheticVideoReader,
    native_available,
    open_video,
    write_y4m,
)

needs_native = pytest.mark.skipif(not native_available(), reason="libvideodec unavailable")


def limited_range(v: np.ndarray) -> np.ndarray:
    """Gray value v -> decoded value. The full-range tag is honored, so this is now the
    identity (name kept for the call sites' history; the old studio-range expansion
    modeled the pre-fix behavior of ignoring the Y4M XCOLORRANGE tag)."""
    return np.asarray(v, np.uint8)


@pytest.fixture()
def gray_video(tmp_path):
    frames = np.stack([np.full((48, 64, 3), (i * 4) % 250, np.uint8) for i in range(50)])
    path = str(tmp_path / "v.y4m")
    write_y4m(path, frames)
    return path, frames


@needs_native
class TestNativeReader:
    def test_metadata(self, gray_video):
        path, frames = gray_video
        with open_video(path) as vr:
            assert len(vr) == 50
            assert (vr.height, vr.width) == (48, 64)
            assert vr.fps == 25.0

    def test_get_batch_frame_accurate(self, gray_video):
        path, frames = gray_video
        with open_video(path) as vr:
            batch = vr.get_batch([0, 7, 23, 49])
        for row, idx in enumerate([0, 7, 23, 49]):
            expected = limited_range(np.array(frames[idx, 0, 0, 0]))
            assert abs(int(batch[row].mean()) - int(expected)) <= 1, (idx, batch[row].mean(), expected)

    def test_get_batch_preserves_request_order(self, gray_video):
        """decord returns frames in REQUESTED order — the palindrome short-clip
        completion (ucf101_dl.py:550-567, data/videos.py) sends non-monotonic,
        duplicated index lists whose reversed tail must survive the read."""
        path, frames = gray_video
        req = [0, 8, 16, 24, 16, 8, 0, 24]  # palindrome-style bounce with repeats
        with open_video(path) as vr:
            batch = vr.get_batch(req)
        assert batch.shape[0] == len(req)
        for row, idx in enumerate(req):
            expected = limited_range(np.array(frames[idx, 0, 0, 0]))
            assert abs(int(batch[row].mean()) - int(expected)) <= 1, (row, idx)
        # identical indices must yield identical rows
        np.testing.assert_array_equal(batch[0], batch[6])
        np.testing.assert_array_equal(batch[2], batch[4])

    def test_read_strided(self, gray_video):
        path, frames = gray_video
        with open_video(path) as vr:
            seq = vr.read_strided(4, 6, 3)  # frames 4,7,10,13,16,19
        for row, idx in enumerate(range(4, 20, 3)):
            expected = limited_range(np.array(frames[idx, 0, 0, 0]))
            assert abs(int(seq[row].mean()) - int(expected)) <= 1

    def test_eof_padding(self, gray_video):
        path, frames = gray_video
        with open_video(path) as vr:
            seq = vr.read_strided(45, 10, 2)  # valid frames 45,47,49; rest past EOF
        assert seq.shape == (10, 48, 64, 3)
        for row, idx in enumerate((45, 47, 49)):
            expected = limited_range(np.array(frames[idx, 0, 0, 0]))
            assert abs(int(seq[row].mean()) - int(expected)) <= 1, (row, idx)
        # Past-EOF rows repeat the LAST DECODED frame — not zeros/uninitialized.
        for row in range(3, 10):
            np.testing.assert_array_equal(seq[row], seq[2])

    def test_decoder_resize(self, gray_video):
        path, _ = gray_video
        with open_video(path, out_w=32, out_h=24) as vr:
            batch = vr.get_batch([0])
        assert batch.shape == (1, 24, 32, 3)


class TestSyntheticReader:
    def test_deterministic(self):
        a = SyntheticVideoReader(num_frames=10, height=8, width=8, seed=3)
        b = SyntheticVideoReader(num_frames=10, height=8, width=8, seed=3)
        np.testing.assert_array_equal(a.get_batch([2, 5]), b.get_batch([2, 5]))

    def test_uri_parsing(self):
        vr = open_video("synthetic://n=12,h=16,w=20,seed=9")
        assert len(vr) == 12
        assert vr.get_batch([0]).shape == (1, 16, 20, 3)


@needs_native
class TestMp4Encoder:
    """Native mp4 encode path (ve_open/ve_write/ve_close) — the imageio replacement
    (visualize_anonymization.py:84-115)."""

    def test_roundtrip_x264(self, tmp_path):
        from ted_spad_tpu.data.video_reader import SyntheticVideoReader, VideoReader, write_mp4

        frames = SyntheticVideoReader(num_frames=20, height=120, width=160, seed=3001).get_batch(range(20))
        p = write_mp4(str(tmp_path / "rt.mp4"), frames, fps=30)
        vr = VideoReader(p)
        assert len(vr) == 20 and (vr.width, vr.height) == (160, 120)
        assert abs(vr.fps - 30.0) < 0.01
        back = vr.get_batch(range(20))
        vr.close()
        # Lossy (crf 18 + 4:2:0): demand close luma-scale agreement, not bit equality.
        err = np.abs(back.astype(np.float32) - frames.astype(np.float32)).mean()
        assert err < 12.0, err

    def test_mpeg4_codec_and_odd_size_crop(self, tmp_path):
        from ted_spad_tpu.data.video_reader import VideoReader, write_mp4

        frames = np.full((5, 121, 161, 3), 128, np.uint8)  # odd dims -> cropped even
        p = write_mp4(str(tmp_path / "odd.mp4"), frames, fps=25, codec="mpeg4")
        vr = VideoReader(p)
        assert (vr.width, vr.height) == (160, 120)
        assert len(vr) == 5
        vr.close()


@needs_native
class TestDecodeOpts:
    """vd_open_opts: decoder threads + fast (loop-filter-skip) mode."""

    def _fixture(self, tmp_path):
        from ted_spad_tpu.data.video_reader import SyntheticVideoReader, write_mp4

        frames = SyntheticVideoReader(num_frames=40, height=120, width=160, seed=7).get_batch(range(40))
        return write_mp4(str(tmp_path / "opts.mp4"), frames, fps=25)

    def test_threads_one_bit_identical(self, tmp_path):
        from ted_spad_tpu.data.video_reader import VideoReader

        p = self._fixture(tmp_path)
        auto = VideoReader(p)
        one = VideoReader(p, threads=1)
        a, b = auto.get_batch(range(40)), one.get_batch(range(40))
        auto.close(), one.close()
        np.testing.assert_array_equal(a, b)  # threading never changes decoded pixels

    def test_fast_mode_decodes_near_identical(self, tmp_path):
        """fast=True (skip_loop_filter) must keep frame count/shape and stay visually
        indistinguishable — deblocking only shifts pixels at block borders. Guards
        against the flag accidentally dropping frames (skip_frame-style discards)."""
        from ted_spad_tpu.data.video_reader import VideoReader

        p = self._fixture(tmp_path)
        norm = VideoReader(p)
        fast = VideoReader(p, threads=1, fast=True)
        a, b = norm.get_batch(range(40)), fast.get_batch(range(40))
        norm.close(), fast.close()
        assert a.shape == b.shape == (40, 120, 160, 3)
        mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        assert psnr > 35.0, psnr  # near-identical, not bit-identical


@needs_native
class TestEofRecovery:
    """After a read past the real end drains the codec, later reads of EXISTING
    frames must still work: the drained codec only recovers via flush+seek, and the
    forward-window check used to skip that seek — real frames came back as silent
    zero padding (estimated frame counts routinely overshoot, so a first clamped/
    palindromed read hitting EOF is normal, e.g. the second view of a contrastive
    pair on the same reader)."""

    def test_read_after_eof_returns_real_frames(self, tmp_path):
        from ted_spad_tpu.data.video_reader import SyntheticVideoReader, VideoReader, write_mp4

        frames = SyntheticVideoReader(num_frames=30, height=64, width=96, seed=3).get_batch(range(30))
        p = write_mp4(str(tmp_path / "eof.mp4"), frames, fps=25)
        vr = VideoReader(p)
        first = vr.get_batch([28, 29, 45])  # 45 past the end -> EOF + pad
        np.testing.assert_array_equal(first[2], first[1])  # padded with last frame
        again = vr.get_batch([28])  # inside the old forward window, codec drained
        vr.close()
        assert again[0].any(), "post-EOF read returned zero padding for a real frame"
        np.testing.assert_array_equal(again[0], first[0])

    def test_methods_after_close_raise(self, tmp_path):
        from ted_spad_tpu.data.video_reader import SyntheticVideoReader, VideoReader, write_mp4

        frames = SyntheticVideoReader(num_frames=8, height=64, width=96, seed=1).get_batch(range(8))
        p = write_mp4(str(tmp_path / "c.mp4"), frames, fps=25)
        vr = VideoReader(p)
        vr.close()
        with pytest.raises(IOError, match="closed"):
            vr.get_batch([0])
        with pytest.raises(IOError, match="closed"):
            vr.read_strided(0, 2, 1)


@needs_native
def test_writer_rejects_undersized_frames(tmp_path):
    from ted_spad_tpu.data.video_reader import VideoWriter

    with VideoWriter(str(tmp_path / "w.mp4"), 64, 48, fps=25) as vw:
        with pytest.raises(ValueError, match="incompatible"):
            vw.write(np.zeros((32, 64, 3), np.uint8))  # too short: OOB read in C
        with pytest.raises(ValueError, match="incompatible"):
            vw.write(np.zeros((48, 64), np.uint8))  # grayscale
        vw.write(np.zeros((48, 64, 3), np.uint8))  # exact size still fine


def test_synthetic_get_batch_clamps_past_eof():
    from ted_spad_tpu.data.video_reader import SyntheticVideoReader

    vr = SyntheticVideoReader(num_frames=10, height=16, width=16, seed=0)
    batch = vr.get_batch([9, 10, 50])
    np.testing.assert_array_equal(batch[1], batch[0])  # clamped, not wrapped
    np.testing.assert_array_equal(batch[2], batch[0])
