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
        # refs from different videos appear inside one batch (packing): with 5
        # clips/video and batch_size 4, pigeonhole forces some batch to mix videos —
        # per-video flushing (losing the throughput win) would fail this.
        assert any(len({r.video_idx for r in refs}) >= 2 for _, refs, _ in batches)


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


def test_fast_paths_match_module_extraction():
    """The extract step's fused fa + s2d stem + bridge must produce the same features
    as the plain module composition (dali_extraction.py:168-179 semantics)."""
    import jax.numpy as jnp
    import numpy as np

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

    fa_model, fa_vars = load_fa_model(image_size=(48, 64), dtype="float32")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=5, clip_shape=(4, 48, 64), dtype="float32"
    )
    p = FeatureExtractionParams(
        num_frames=4, reso_h=48, reso_w=64, compute_dtype="float32"
    )
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))

    rng = np.random.default_rng(3)
    clips = jnp.asarray(rng.integers(0, 255, (2, 4, 60, 80, 3), dtype=np.uint8))
    got = extract(ft_vars, clips)

    img = center_crop_resize(clips.astype(jnp.float32) / 255.0, p.cropping_factor, 48, 64)
    frames = img.reshape((-1,) + img.shape[-3:])
    anon = fa_model.apply(fa_vars, frames, train=False)
    anon = anon.reshape(img.shape[:-3] + anon.shape[-3:])
    ref = ft_model.apply(ft_vars, anon, train=False, method="extract_features")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestCorruptVideoTolerance:
    """VERDICT r2 #4: one broken file must not kill an extraction run (reference's
    return-None + collate-filter pattern, ucf101_dl.py:143-146, applied to extraction)."""

    def test_failing_uri_mid_list_skipped(self, tmp_path):
        from ted_spad_tpu.stages.feature_extraction import extract_features

        p = FeatureExtractionParams(
            num_frames=8, fix_skip=2, batch_size=4, reso_h=32, reso_w=32,
            anonymized=False, compute_dtype="float32",
        )
        # Middle URI has an unparsable synthetic spec -> decode_video raises.
        uris = [
            "synthetic://n=80,h=48,w=64,seed=0",
            "synthetic://n=bad,h=48,w=64,seed=1",
            "synthetic://n=80,h=48,w=64,seed=2",
        ]
        res = extract_features(
            p, uris, str(tmp_path / "feats"), decode_hw=(48, 64), log_fn=lambda s: None
        )
        assert len(res["saved"]) == 2
        assert list(res["skipped"]) == [uris[1]]
        assert "ValueError" in res["skipped"][uris[1]]
        for path in res["saved"].values():
            assert np.load(path).shape[1] == 2048

    def test_strict_mode_raises_without_on_error(self):
        p = FeatureExtractionParams(num_frames=4, fix_skip=2)
        with pytest.raises(ValueError):
            list(iter_clip_batches(["synthetic://n=bad"], p, 2, decode_hw=(24, 32)))


def test_out_path_collision_disambiguated(tmp_path):
    """Same-basename videos in different directories must not clobber each other's
    .npy (VERDICT r2 weak #4)."""
    from ted_spad_tpu.data.video_reader import native_available, write_mp4
    from ted_spad_tpu.stages.feature_extraction import extract_features

    if not native_available():
        pytest.skip("native videodec unavailable")
    rng = np.random.default_rng(0)
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        frames = rng.integers(0, 255, (24, 48, 64, 3), dtype=np.uint8)
        write_mp4(str(d / "x.mp4"), frames, fps=25.0)
    p = FeatureExtractionParams(
        num_frames=8, fix_skip=2, batch_size=4, reso_h=32, reso_w=32,
        anonymized=False, compute_dtype="float32",
    )
    uris = [str(tmp_path / "a" / "x.mp4"), str(tmp_path / "b" / "x.mp4")]
    res = extract_features(p, uris, str(tmp_path / "feats"), decode_hw=(48, 64),
                           log_fn=lambda s: None)
    assert len(res["saved"]) == 2
    paths = set(res["saved"].values())
    assert len(paths) == 2  # distinct outputs, no silent clobber
    for path in paths:
        assert "x_" in path.rsplit("/", 1)[1]  # hash-suffixed


def test_yuv_rejects_no_ar_distortion_at_step_level():
    """ADVICE r2: make_extract_step itself must reject yuv + no_ar_distortion so direct
    callers (bench.py) cannot silently get aspect-distorted output."""
    from ted_spad_tpu.models import load_ft_model
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

    ft_model, _ = load_ft_model("largei3d", num_classes=5, clip_shape=(4, 32, 32),
                                dtype="float32")
    p = FeatureExtractionParams(num_frames=4, reso_h=32, reso_w=32, no_ar_distortion=True)
    with pytest.raises(ValueError, match="no_ar_distortion"):
        make_extract_step(ft_model, p, yuv=True)


def test_yuv_bt709_flows_with_tag_byte(monkeypatch):
    """A BT.709-tagged stream is accepted in yuv mode: its packed rows carry the
    trailing tag byte 255 (601/untagged rows carry 0), which make_extract_step turns
    into the per-row matrix select (ops/yuv.py bt709 flags)."""
    import ted_spad_tpu.stages.feature_extraction as fe
    from ted_spad_tpu.data.video_reader import SyntheticVideoReader

    class BT709Reader(SyntheticVideoReader):
        colorspace = 709

    monkeypatch.setattr(
        fe, "open_video",
        lambda path, *a, **k: BT709Reader(num_frames=40) if "709" in path
        else SyntheticVideoReader(num_frames=40),
    )
    p = FeatureExtractionParams(num_frames=4, fix_skip=2)
    batches = list(fe.iter_clip_batches(["v709.mp4", "v601.mp4"], p, 4,
                                        decode_hw=(240, 320), decode_mode="yuv"))
    assert batches
    plane_bytes = 240 * 320 * 3 // 2
    tags = {}
    for clips, refs, _ in batches:
        assert clips.shape[-1] == plane_bytes + 1
        for row, ref in enumerate(refs):
            tags.setdefault(ref.video_idx, set()).add(int(clips[row, 0, -1]))
    assert tags[0] == {1} and tags[1] == {0}  # bit 0 = BT.709; limited range (bit 1 clear)


def test_yuv_rejects_exotic_colorspace(monkeypatch):
    """BT.2020 and other exotic tags (vd_colorspace -1) are still rejected in yuv
    mode with rgb-mode guidance."""
    import ted_spad_tpu.stages.feature_extraction as fe
    from ted_spad_tpu.data.video_reader import SyntheticVideoReader

    class BT2020Reader(SyntheticVideoReader):
        colorspace = -1

    monkeypatch.setattr(fe, "open_video", lambda *a, **k: BT2020Reader(num_frames=40))
    p = FeatureExtractionParams(num_frames=4, fix_skip=2)
    with pytest.raises(RuntimeError, match="decode_mode='rgb'"):
        list(fe.iter_clip_batches(["v.mp4"], p, 2, decode_hw=(240, 320),
                                  decode_mode="yuv"))


def test_native_colorspace_tag_readable(tmp_path):
    """vd_colorspace returns a sane family for our own encoder's output (untagged or
    601 -> accepted by the yuv path)."""
    from ted_spad_tpu.data.video_reader import VideoReader, native_available, write_mp4

    if not native_available():
        pytest.skip("native videodec unavailable")
    frames = np.zeros((8, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "v.mp4")
    write_mp4(path, frames, fps=25.0)
    with VideoReader(path) as vr:
        assert vr.colorspace in (0, 601)


@pytest.mark.slow
def test_run_parity_dry_run_chain(tmp_path):
    """CI-style validation of the one-command parity harness (VERDICT r3 #5): seeds
    synthesized from the torch oracles -> converted -> all stages chained -> delta
    report written. Tiny scale; asserts plumbing, not metric quality."""
    import json
    import os
    import types

    import importlib.util

    # Absolute path — the suite must pass from any cwd; run_parity.py puts the repo
    # root on sys.path itself, so no sys.path mutation here.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_parity_mod", os.path.join(root, "scripts", "run_parity.py")
    )
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    args = types.SimpleNamespace(
        dry_run=True, save_dir=str(tmp_path), epochs=1, seed=0, num_workers=2,
        seeds_dir=None, params_dir=None, fb_ssl_ckpt=None, tiny=True,
        ucf101_train_list=None, ucf101_val_list=None, ucf101_videos=None,
        ucf101_frames=None, vispr_train=None, vispr_test=None, vispr_labels=None,
        crime_glob=None, crime_test_glob=None, crime_gt=None,
    )
    report = rp.run_parity(args)
    assert set(report) >= {"cmap_raw", "cmap_anon", "cmap_delta_pct", "auc_raw",
                           "auc_anon", "auc_delta_pts"}
    assert report["seeds_converted"] == ["fa", "fb", "ft"]
    on_disk = json.load(open(tmp_path / "parity_report.json"))
    assert on_disk["cmap_delta_target_pct"] == -32.25
    assert on_disk["auc_delta_target_pts"] == -3.69


def test_cross_shard_same_basename_disambiguated(tmp_path):
    """Dedup must be computed over the FULL uri list before sharding — shard-local
    counting would let cross-shard same-basename videos clobber one output."""
    from ted_spad_tpu.data.video_reader import native_available, write_mp4
    from ted_spad_tpu.stages.feature_extraction import extract_features

    if not native_available():
        pytest.skip("native videodec unavailable")
    rng = np.random.default_rng(0)
    uris = []
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        write_mp4(str(d / "x.mp4"), rng.integers(0, 255, (24, 48, 64, 3), dtype=np.uint8))
        uris.append(str(d / "x.mp4"))
    p = FeatureExtractionParams(num_frames=8, fix_skip=2, batch_size=4, reso_h=32,
                                reso_w=32, anonymized=False, compute_dtype="float32")
    outs = []
    for shard in (0, 1):
        res = extract_features(p, uris, str(tmp_path / "feats"), decode_hw=(48, 64),
                               shard_id=shard, num_shards=2, log_fn=lambda s: None)
        outs.extend(res["saved"].values())
    assert len(set(outs)) == 2  # distinct hash-suffixed paths, no clobber


def test_resume_reports_existing(tmp_path):
    """Re-running extraction returns already-extracted artifacts in ``existing`` so
    chained consumers (run_parity) keep list/gt alignment across resumes."""
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = FeatureExtractionParams(num_frames=8, fix_skip=2, batch_size=4, reso_h=32,
                                reso_w=32, anonymized=False, compute_dtype="float32")
    uris = [f"synthetic://n=80,h=48,w=64,seed={i}" for i in range(2)]
    r1 = extract_features(p, uris, str(tmp_path / "f"), decode_hw=(48, 64), log_fn=lambda s: None)
    r2 = extract_features(p, uris, str(tmp_path / "f"), decode_hw=(48, 64), log_fn=lambda s: None)
    assert len(r1["saved"]) == 2 and r1["existing"] == {}
    assert r2["clips"] == 0 and set(r2["existing"]) == set(uris)
    assert set(r2["existing"].values()) == set(r1["saved"].values())


def test_dedup_names_disambiguates_same_basename():
    from ted_spad_tpu.utils.naming import dedup_names

    uris = ["a/video.mp4", "b/video.mp4", "c/other.mp4"]
    names = dedup_names(uris)
    assert len(set(names.values())) == 3
    assert names["c/other.mp4"] == "other"
    assert all(n.startswith("video_") for u, n in names.items() if "video" in u)


def test_few_videos_use_frame_threaded_decode_identically(tmp_path):
    """With fewer videos than workers the idle worker budget becomes libavcodec frame
    threads (the serving case — scripts/score_video.py on one long video); the decoded
    clip stream must be bit-identical to the one-thread-per-decoder path."""
    from ted_spad_tpu.data.video_reader import native_available, write_mp4

    if not native_available():
        pytest.skip("native videodec unavailable")
    rng = np.random.default_rng(5)
    uri = str(tmp_path / "one.mp4")
    write_mp4(uri, rng.integers(0, 255, (48, 48, 64, 3), dtype=np.uint8))
    p = FeatureExtractionParams(num_frames=8, fix_skip=2, batch_size=4)

    def clips_with(workers):  # 1 video: num_workers=4 -> threads=4, =1 -> threads=1
        out = {}
        for clips, refs, _ in iter_clip_batches([uri], p, 4, decode_hw=(48, 64),
                                                num_workers=workers):
            for row, ref in enumerate(refs):
                out[(ref.video_idx, ref.clip_idx)] = np.asarray(clips)[row]
        return out

    threaded, single = clips_with(4), clips_with(1)
    assert threaded.keys() == single.keys() and len(threaded) > 1
    for k in threaded:
        np.testing.assert_array_equal(threaded[k], single[k])


class TestMultiCropExtraction:
    """ncrops TTA fan-out (the published MGFN feature releases are 10-crop; the
    reference's extraction is center-crop-only, dali_extraction.py:38-50)."""

    def test_multi_crop_views_geometry(self):
        from ted_spad_tpu.ops.augment import center_crop_resize, multi_crop_resize
        import jax

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 3, 40, 80, 3), dtype=np.uint8)
        out = np.asarray(multi_crop_resize(frames, 0.8, 24, 24, 10))
        assert out.shape == (2, 10, 3, 24, 24, 3)
        # View 4 (center) is exactly the single-crop validation transform.
        center = np.asarray(center_crop_resize(frames, 0.8, 24, 24))
        np.testing.assert_allclose(out[:, 4], center, rtol=1e-6, atol=1e-6)
        # torchvision ten_crop definition: the second five ARE five_crop(hflip(img))
        # (not per-view flips of the first five, which would swap crops 5<->6, 7<->8).
        from_flipped = np.asarray(multi_crop_resize(frames[..., ::-1, :], 0.8, 24, 24, 5))
        np.testing.assert_allclose(out[:, 5:], from_flipped, rtol=1e-6, atol=1e-6)
        # View 0 is the top-left window resized with the same resize as the center.
        ch, cw = int(40 * 0.8), int(80 * 0.8)
        tl = jax.image.resize(
            frames[:, :, :ch, :cw, :].astype(np.float32) / 255.0,
            (2, 3, 24, 24, 3), method="linear", antialias=True,
        )
        np.testing.assert_allclose(out[:, 0], np.asarray(tl), rtol=1e-6, atol=1e-6)

    def test_extraction_ncrops10_features_and_center_parity(self, tmp_path):
        from ted_spad_tpu.stages.feature_extraction import extract_features

        uris = [f"synthetic://n=40,h=40,w=80,seed={i}" for i in range(2)]
        base = FeatureExtractionParams(num_frames=8, fix_skip=2, batch_size=4, reso_h=32,
                                       reso_w=32, anonymized=False, compute_dtype="float32")
        r1 = extract_features(base, uris, str(tmp_path / "f1"), decode_hw=(40, 80),
                              log_fn=lambda s: None)
        r10 = extract_features(base.replace(ncrops=10), uris, str(tmp_path / "f10"),
                               decode_hw=(40, 80), log_fn=lambda s: None)
        for uri in uris:
            f1 = np.load(r1["saved"][uri])    # (T, 2048)
            f10 = np.load(r10["saved"][uri])  # (T, 10, 2048)
            assert f10.shape == (f1.shape[0], 10, f1.shape[1])
            # The center view reproduces the single-crop features (same window, same
            # resize, same ft) — crop fan-out must not perturb the baseline path.
            np.testing.assert_allclose(f10[:, 4], f1, rtol=2e-4, atol=2e-4)
            # Corner views see different pixels -> genuinely different features.
            assert np.abs(f10[:, 0] - f1).max() > 1e-3

        # The MGFN stage consumes the (T, ncrops, F) layout natively (the published
        # feature releases' shape): one train step + masked-bucket scoring over the
        # self-extracted 10-crop features.
        import jax
        import jax.numpy as jnp

        from ted_spad_tpu.config.params import MGFNParams
        from ted_spad_tpu.data.features import padded_test_batch
        from ted_spad_tpu.models import load_mgfn_model
        from ted_spad_tpu.ops.temporal import segment_train_features, test_features
        from ted_spad_tpu.stages.anomaly_detection import (
            make_optimizer,
            make_score_fn,
            make_train_step,
        )

        mp = MGFNParams(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16)
        model, variables = load_mgfn_model(mp, ncrops=10)
        opt = make_optimizer(mp)
        st = opt.init(variables["params"])
        step = make_train_step(model, opt, mp)
        seg = np.stack([segment_train_features(np.load(r10["saved"][u])) for u in uris])
        assert seg.shape == (2, 10, mp.seg_length, mp.feature_size + 1)
        variables, st, loss = step(
            variables, st, jax.random.PRNGKey(0),
            jnp.asarray(seg[:1]), jnp.zeros((1,), jnp.float32),
            jnp.asarray(seg[1:]), jnp.ones((1,), jnp.float32),
        )
        assert np.isfinite(float(loss))
        video, mask, _ = padded_test_batch(test_features(np.load(r10["saved"][uris[0]])))
        scores = np.asarray(
            make_score_fn(model)(variables, jnp.asarray(video), jnp.asarray(mask))
        )
        assert scores.shape == (1, video.shape[2]) and np.isfinite(scores).all()

    def test_ncrops_rejects_incompatible_modes(self):
        from ted_spad_tpu.stages.feature_extraction import make_extract_step

        p = FeatureExtractionParams(ncrops=10, quirk_compat=True)
        with pytest.raises(ValueError, match="ncrops"):
            make_extract_step(object(), p)
        with pytest.raises(ValueError, match="ncrops"):
            make_extract_step(object(), FeatureExtractionParams(ncrops=3))


def test_iter_clip_batches_abandonment_shuts_down_pool():
    """A consumer that abandons the generator mid-run (its loop body raised) must not
    leave the decode pool running: close() triggers the finally-shutdown, queued
    decodes are cancelled, and the worker threads exit instead of being joined for
    minutes at process exit."""
    import threading
    import time as _time

    p = FeatureExtractionParams(num_frames=4, fix_skip=2, batch_size=2)
    uris = [f"synthetic://n=40,h=24,w=32,seed={i}" for i in range(12)]
    before = threading.active_count()
    gen = iter_clip_batches(uris, p, 2, decode_hw=(24, 32), num_workers=4)
    next(gen)  # pool spun up, look-ahead window submitted
    assert threading.active_count() > before
    gen.close()  # GeneratorExit at the yield -> finally -> pool.shutdown(cancel)
    deadline = _time.time() + 20
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before
