"""Planar YUV420 ingest tests (native/videodec yuv reads + ops/yuv.py device preprocess).

Reference semantics: the val transform (/255, center-crop 0.8, resize) applied to the
decoded RGB frames (dali_extraction.py:38-50). The planar mode moves the color
conversion device-side; these tests pin it to the RGB path within chroma-subsampling
tolerance and to an exact numpy oracle of its own definition."""

import numpy as np
import pytest

from ted_spad_tpu.data.video_reader import SyntheticVideoReader, native_available, open_video, write_mp4
from ted_spad_tpu.ops.augment import center_crop_resize
from ted_spad_tpu.ops.pallas_preprocess import resize_matrix
from ted_spad_tpu.ops.yuv import fused_preprocess_yuv


def _numpy_oracle(y, u, v, out_h, out_w, cf, full_range=False, matrix="601"):
    h, w = y.shape[-2:]
    ch, cw = int(h * cf), int(w * cf)
    y0, x0 = int(round((h - ch) / 2)), int(round((w - cw) / 2))
    ry = resize_matrix(h, out_h, y0, ch)
    rxt = resize_matrix(w, out_w, x0, cw).T
    cry = resize_matrix(h // 2, out_h, y0 // 2, ch // 2)
    crxt = resize_matrix(w // 2, out_w, x0 // 2, cw // 2).T

    rs = lambda p, a, bt: np.einsum("oh,...hw,wx->...ox", a, p.astype(np.float32), bt)
    yf = rs(y, ry, rxt)
    uf = rs(u, cry, crxt) - 128.0
    vf = rs(v, cry, crxt) - 128.0
    coeffs = {
        ("601", False): (1.596027, -0.391762, -0.812968, 2.017232),
        ("601", True): (1.402, -0.344136, -0.714136, 1.772),
        ("709", False): (1.792741, -0.213249, -0.532909, 2.112402),
        ("709", True): (1.5748, -0.187324, -0.468124, 1.8556),
    }
    rv, gu, gv, bu = coeffs[(matrix, full_range)]
    yy = yf if full_range else 1.164383 * (yf - 16.0)
    rgb = np.stack([yy + rv * vf, yy + gu * uf + gv * vf, yy + bu * uf], -1) / 255.0
    return np.clip(rgb, 0, 1)


def _chroma_rich_frames(t: int, h: int, w: int) -> np.ndarray:
    """Smooth (codec-friendly) but chroma-rich frames — saturated colors make the
    601/709 matrix difference visible, which the cosine assertions rely on."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ts = np.arange(t, dtype=np.float32)[:, None, None]
    return np.stack(
        [
            np.clip(127.5 + 90 * np.sin(xx / 9 + ts / 5), 0, 255),
            np.clip(127.5 + 80 * np.cos(yy / 7 - ts / 9), 0, 255),
            np.clip(127.5 + 85 * np.sin((xx + yy) / 11 + ts / 7), 0, 255),
        ],
        -1,
    ).astype(np.uint8)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    y = rng.integers(16, 236, (2, 3, 48, 64), np.uint8)
    u = rng.integers(16, 241, (2, 3, 24, 32), np.uint8)
    v = rng.integers(16, 241, (2, 3, 24, 32), np.uint8)
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32)
    )
    # cf=0.75 of 48x64 -> 36x48 crop, offsets (6,8): even -> chroma-aligned.
    ref = _numpy_oracle(y, u, v, 32, 40, 0.75)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gray_content_matches_rgb_path():
    """With constant chroma the subsampling is lossless, so the YUV path must equal
    the RGB val-transform path to float tolerance."""
    rng = np.random.default_rng(1)
    y = rng.integers(16, 236, (1, 2, 48, 64), np.uint8)
    u = np.full((1, 2, 24, 32), 128, np.uint8)
    v = np.full((1, 2, 24, 32), 128, np.uint8)
    rgb = np.clip(1.164383 * (y.astype(np.float32) - 16.0), 0, 255)
    rgb = np.repeat(rgb[..., None], 3, -1)
    ref = np.asarray(center_crop_resize(rgb / 255.0, 0.75, 32, 40))
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_synthetic_reader_yuv_close_to_rgb():
    vr = SyntheticVideoReader(num_frames=12, height=48, width=64, seed=2003)
    rgb = vr.read_strided(0, 4, 2).astype(np.float32) / 255.0
    y, u, v, full = vr.read_strided_yuv(0, 4, 2)
    assert not full
    ref = np.asarray(center_crop_resize(rgb[None], 0.75, 32, 40))[0]
    got = np.asarray(
        fused_preprocess_yuv(y[None], u[None], v[None], out_h=32, out_w=40,
                             cropping_factor=0.75, out_dtype=np.float32)
    )[0]
    d = np.abs(got - ref)
    # The synthetic frames are mod-256 sawtooth stripes — their wrap edges are a
    # chroma-subsampling worst case, so bounds are looser than for natural content.
    assert d.mean() < 0.04 and d.max() < 0.6, (d.mean(), d.max())


def test_full_range_matches_oracle():
    """The full-range (yuvj/pc) matrix — reachable via fused_preprocess_yuv's
    ``full_range=True`` for callers handling yuvj sources directly."""
    rng = np.random.default_rng(4)
    y = rng.integers(0, 256, (1, 2, 48, 64), np.uint8)
    u = rng.integers(0, 256, (1, 2, 24, 32), np.uint8)
    v = rng.integers(0, 256, (1, 2, 24, 32), np.uint8)
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32, full_range=True)
    )
    ref = _numpy_oracle(y, u, v, 32, 40, 0.75, full_range=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_bt709_rows_match_oracle_and_mix_with_601():
    """Per-row ``bt709`` flags: flagged rows convert with the BT.709 matrix, unflagged
    rows stay bit-identical to the flagless BT.601 program (mixed extraction batches)."""
    rng = np.random.default_rng(7)
    y = rng.integers(16, 236, (3, 2, 48, 64), np.uint8)
    u = rng.integers(16, 241, (3, 2, 24, 32), np.uint8)
    v = rng.integers(16, 241, (3, 2, 24, 32), np.uint8)
    flags = np.asarray([False, True, False])
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32, bt709=flags)
    )
    ref601 = _numpy_oracle(y, u, v, 32, 40, 0.75, matrix="601")
    ref709 = _numpy_oracle(y, u, v, 32, 40, 0.75, matrix="709")
    np.testing.assert_allclose(got[[0, 2]], ref601[[0, 2]], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], ref709[1], rtol=1e-4, atol=1e-4)
    # The matrices genuinely differ on chroma-rich content.
    assert np.abs(ref709[1] - ref601[1]).max() > 0.01
    # Unflagged rows == the flagless program (same math; the coefficient blend with
    # sel=0 reassociates the fused arithmetic, so float-tolerance not bit-equality).
    base = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32)
    )
    np.testing.assert_allclose(got[[0, 2]], base[[0, 2]], rtol=1e-6, atol=1e-6)


def test_bt709_full_range_matches_oracle():
    rng = np.random.default_rng(8)
    y = rng.integers(0, 256, (1, 2, 48, 64), np.uint8)
    u = rng.integers(0, 256, (1, 2, 24, 32), np.uint8)
    v = rng.integers(0, 256, (1, 2, 24, 32), np.uint8)
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32, full_range=True,
                             bt709=np.asarray([True]))
    )
    ref = _numpy_oracle(y, u, v, 32, 40, 0.75, full_range=True, matrix="709")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_four_way_matrix_range_mix_matches_oracle():
    """One batch mixing all four (matrix x range) combinations — one compiled
    program converts each row with its own coefficients (the extraction tag-byte
    path's device half)."""
    rng = np.random.default_rng(9)
    y = rng.integers(16, 236, (4, 2, 48, 64), np.uint8)
    u = rng.integers(16, 241, (4, 2, 24, 32), np.uint8)
    v = rng.integers(16, 241, (4, 2, 24, 32), np.uint8)
    bt709 = np.asarray([False, True, False, True])
    full = np.asarray([False, False, True, True])
    got = np.asarray(
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.75,
                             out_dtype=np.float32, bt709=bt709, full=full)
    )
    for row, (m, fr) in enumerate(zip(("601", "709", "601", "709"), full)):
        ref = _numpy_oracle(y[row : row + 1], u[row : row + 1], v[row : row + 1],
                            32, 40, 0.75, full_range=bool(fr), matrix=m)[0]
        np.testing.assert_allclose(got[row], ref, rtol=1e-4, atol=1e-4, err_msg=f"row {row}")


@pytest.mark.skipif(not native_available(), reason="native videodec unavailable")
def test_extract_features_yuv_mode_full_range_y4m(tmp_path):
    """End-to-end: a real full-range file (Y4M, XCOLORRANGE=FULL) extracts in yuv
    mode — the tag byte carries the range bit and the device conversion uses the
    full-range transfer — matching the (also range-honoring) rgb mode."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.data.video_reader import write_y4m
    from ted_spad_tpu.stages.feature_extraction import extract_features

    frames = _chroma_rich_frames(48, 40, 80)
    path = str(tmp_path / "vfull.y4m")
    write_y4m(path, frames)

    p = FeatureExtractionParams(
        num_frames=8, reso_h=48, reso_w=64, compute_dtype="float32", anonymized=False
    )
    r_rgb = extract_features(p, [path], str(tmp_path / "rgb"), decode_hw=(40, 80),
                             batch_size=4, log_fn=lambda s: None)
    r_yuv = extract_features(p, [path], str(tmp_path / "yuv"), decode_hw=(40, 80),
                             batch_size=4, decode_mode="yuv", log_fn=lambda s: None)
    assert r_yuv["clips"] == r_rgb["clips"] > 0
    a, b = np.load(r_rgb["saved"][path]), np.load(r_yuv["saved"][path])
    cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
    assert cos > 0.99, cos


@pytest.mark.skipif(not native_available(), reason="native videodec unavailable")
def test_native_bt709_roundtrip_and_parity(tmp_path):
    """A BT.709-tagged encode (ve_open_cs) roundtrips: the tag survives the container,
    the RGB decode honors it (reproduces the source frames better than the wrong
    matrix would), and the planar path with the per-row flag matches the RGB path."""
    from ted_spad_tpu.data.video_reader import VideoReader

    frames = _chroma_rich_frames(24, 48, 64)
    path = str(tmp_path / "v709.mp4")
    write_mp4(path, frames, fps=25.0, codec="libx264", colorspace=709)

    vr = VideoReader(path)
    assert vr.colorspace == 709  # tag survived encoder + mp4 muxer
    rgb = vr.get_batch(list(range(8))).astype(np.float32)
    # Tag honored: decoded RGB ≈ source (codec noise only).
    assert np.abs(rgb - frames[:8]).mean() < 4.0

    # Planar path with the 709 row flag matches the RGB path…
    y, u, v, full = vr.read_strided_yuv(0, 4, 2)
    assert not full
    ref = np.asarray(center_crop_resize(rgb[None, 0:8:2] / 255.0, 0.75, 32, 40))[0]
    got709 = np.asarray(
        fused_preprocess_yuv(y[None], u[None], v[None], out_h=32, out_w=40,
                             cropping_factor=0.75, out_dtype=np.float32,
                             bt709=np.asarray([True]))
    )[0]
    d = np.abs(got709 - ref)
    assert d.mean() < 0.02 and d.max() < 0.3, (d.mean(), d.max())
    # …and the flag matters: converting the same planes as BT.601 is visibly worse.
    got601 = np.asarray(
        fused_preprocess_yuv(y[None], u[None], v[None], out_h=32, out_w=40,
                             cropping_factor=0.75, out_dtype=np.float32)
    )[0]
    assert np.abs(got601 - ref).mean() > 2 * d.mean()
    vr.close()


@pytest.mark.skipif(not native_available(), reason="native videodec unavailable")
def test_extract_features_yuv_mode_bt709_file(tmp_path):
    """End-to-end: a BT.709-tagged real file extracts in yuv mode (per-row flag path)
    with features matching rgb mode — both paths honor the tag."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    frames = _chroma_rich_frames(48, 40, 80)
    path = str(tmp_path / "v709.mp4")
    write_mp4(path, frames, fps=25.0, codec="libx264", colorspace=709)

    p = FeatureExtractionParams(
        num_frames=8, reso_h=48, reso_w=64, compute_dtype="float32", anonymized=False
    )
    r_rgb = extract_features(p, [path], str(tmp_path / "rgb"), decode_hw=(40, 80),
                             batch_size=4, log_fn=lambda s: None)
    r_yuv = extract_features(p, [path], str(tmp_path / "yuv"), decode_hw=(40, 80),
                             batch_size=4, decode_mode="yuv", log_fn=lambda s: None)
    assert r_yuv["clips"] == r_rgb["clips"] > 0
    a, b = np.load(r_rgb["saved"][path]), np.load(r_yuv["saved"][path])
    cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
    assert cos > 0.99, cos


@pytest.mark.skipif(not native_available(), reason="native videodec unavailable")
def test_extract_features_yuv_mode_mixed_colorimetry_run(tmp_path):
    """ONE extraction run over three real files with different colorimetry (BT.709
    mp4, BT.601 mp4, full-range Y4M): cross-video packing mixes their clips within
    batches, and the per-row tag byte must keep each video's conversion correct —
    every video's yuv-mode features match its rgb-mode features."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.data.video_reader import write_y4m
    from ted_spad_tpu.stages.feature_extraction import extract_features

    frames = _chroma_rich_frames(48, 40, 80)
    p709 = write_mp4(str(tmp_path / "v709.mp4"), frames, codec="libx264", colorspace=709)
    p601 = write_mp4(str(tmp_path / "v601.mp4"), frames, codec="libx264", colorspace=601)
    pfull = write_y4m(str(tmp_path / "vfull.y4m"), frames)
    uris = [p709, p601, pfull]

    p = FeatureExtractionParams(
        num_frames=8, reso_h=48, reso_w=64, compute_dtype="float32", anonymized=False
    )
    # batch 4 vs 3 clips/video -> batches straddle video boundaries (mixed rows).
    r_rgb = extract_features(p, uris, str(tmp_path / "rgb"), decode_hw=(40, 80),
                             batch_size=4, log_fn=lambda s: None)
    r_yuv = extract_features(p, uris, str(tmp_path / "yuv"), decode_hw=(40, 80),
                             batch_size=4, decode_mode="yuv", log_fn=lambda s: None)
    assert r_yuv["clips"] == r_rgb["clips"] > 0
    for uri in uris:
        a, b = np.load(r_rgb["saved"][uri]), np.load(r_yuv["saved"][uri])
        cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
        assert cos > 0.99, (uri, cos)


def test_misaligned_crop_rejected():
    y = np.zeros((1, 1, 50, 64), np.uint8)  # cf .8 of 50 -> 40 crop, offset 5 (odd)
    u = np.zeros((1, 1, 25, 32), np.uint8)
    v = np.zeros((1, 1, 25, 32), np.uint8)
    with pytest.raises(ValueError):
        fused_preprocess_yuv(y, u, v, out_h=32, out_w=40, cropping_factor=0.8,
                             out_dtype=np.float32)


@pytest.mark.skipif(not native_available(), reason="native videodec unavailable")
def test_native_yuv_read_close_to_rgb_path(tmp_path):
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    t = np.arange(24, dtype=np.float32)[:, None, None]
    plane = 127.5 + 60 * np.sin(xx / 9 + t / 5) + 50 * np.cos(yy / 7 - t / 9)
    frames = np.stack(
        [np.clip(plane, 0, 255), np.clip(plane * 0.5 + 30, 0, 255), np.clip(255 - plane, 0, 255)],
        -1,
    ).astype(np.uint8)
    path = str(tmp_path / "v.mp4")
    write_mp4(path, frames, fps=25.0)
    vr = open_video(path)
    rgb = vr.read_strided(0, 4, 2).astype(np.float32) / 255.0
    y, u, v, full = vr.read_strided_yuv(0, 4, 2)
    assert not full
    ref = np.asarray(center_crop_resize(rgb[None], 0.75, 32, 40))[0]
    got = np.asarray(
        fused_preprocess_yuv(y[None], u[None], v[None], out_h=32, out_w=40,
                             cropping_factor=0.75, out_dtype=np.float32)
    )[0]
    d = np.abs(got - ref)
    assert d.mean() < 0.02 and d.max() < 0.3, (d.mean(), d.max())


def test_extract_features_yuv_mode(tmp_path):
    """decode_mode='yuv' produces features close to the rgb mode end-to-end."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    # 40x80 @ cf 0.8 -> crop (32, 64) at offsets (4, 8): chroma-aligned.
    uris = [f"synthetic://n=48,h=40,w=80,seed={1000 * i}" for i in range(2)]
    p = FeatureExtractionParams(
        num_frames=8, reso_h=48, reso_w=64, compute_dtype="float32", anonymized=False
    )
    r_rgb = extract_features(p, uris, str(tmp_path / "rgb"), decode_hw=(40, 80),
                             batch_size=4, log_fn=lambda s: None)
    r_yuv = extract_features(p, uris, str(tmp_path / "yuv"), decode_hw=(40, 80),
                             batch_size=4, decode_mode="yuv", log_fn=lambda s: None)
    assert r_yuv["clips"] == r_rgb["clips"] > 0
    for uri in uris:
        a = np.load(r_rgb["saved"][uri])
        b = np.load(r_yuv["saved"][uri])
        assert a.shape == b.shape
        cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
        assert cos > 0.99, cos
