"""Tests for the int8 ft (I3Res50) serving path (ops/quant_i3d.py).

Same evidence structure as test_quant_unetpp: the calibration forward must BE the
production schedule (module parity), the quantized forward must stay close to it,
and the guards must be loud. Runs on the tiny largei3d variant — the quantized
path is generic over ``layer_specs``, so the tiny config exercises the same code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ted_spad_tpu.models import load_ft_model
from ted_spad_tpu.ops.quant_i3d import (
    calibrate_i3d,
    fast_i3d_features_q,
    make_quant_ft_extract,
)
from ted_spad_tpu.ops.quant_unetpp import act_scales_from_absmax


@pytest.fixture(scope="module")
def ft():
    return load_ft_model("largei3d", num_classes=4, clip_shape=(8, 32, 32),
                         dtype="float32", tiny=True)


@pytest.fixture(scope="module")
def calibrated(ft):
    ft_model, ft_vars = ft
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 32, 32, 3))
    feat, stats = jax.jit(
        lambda v, c: calibrate_i3d(ft_model, v, c)
    )(ft_vars, x)
    return x, feat, {k: np.asarray(v) for k, v in stats.items()}


def test_calibration_matches_module_extract(ft, calibrated):
    """calibrate_i3d output == the module's extract_features (eval) — the recorded
    absmaxes describe the tensors the int8 program will actually see."""
    ft_model, ft_vars = ft
    x, feat, stats = calibrated
    ref = ft_model.apply(ft_vars, x, train=False, method="extract_features")
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert all(k.startswith("i3d_") for k in stats)  # fa/ft merge relies on this
    assert "i3d_stem_in" in stats  # recorded even though stem ran bf16
    assert all(np.isfinite(v) and v >= 0 for v in stats.values())


@pytest.mark.parametrize("stem_int8", [False, True])
def test_quantized_close_to_reference(ft, calibrated, stem_int8):
    ft_model, ft_vars = ft
    x, feat, stats = calibrated
    scales = act_scales_from_absmax(stats)
    q = jax.jit(
        lambda v, c: fast_i3d_features_q(ft_model, v, c, scales, stem_int8=stem_int8)
    )(ft_vars, x)
    r, g = np.asarray(feat), np.asarray(q)
    # Pooled features are non-negative post-ReLU averages; relative closeness +
    # high correlation is the right check at this granularity.
    corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
    rel = np.abs(r - g).mean() / max(np.abs(r).mean(), 1e-9)
    assert corr > 0.97, (stem_int8, corr)
    assert rel < 0.15, (stem_int8, rel)


def test_input_s2d_matches_plain(ft, calibrated):
    """Feeding the 2x2-s2d layout directly (the fa-bridged serving path) gives the
    same features as plain clips (the s2d happens inside otherwise)."""
    from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

    ft_model, ft_vars = ft
    x, _, stats = calibrated
    scales = act_scales_from_absmax(stats)
    a = fast_i3d_features_q(ft_model, ft_vars, x, scales)
    b = fast_i3d_features_q(ft_model, ft_vars, space_to_depth_2x2(x.astype(jnp.float32)),
                            scales, input_s2d=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_guards(ft, calibrated):
    ft_model, ft_vars = ft
    x, _, stats = calibrated
    scales = act_scales_from_absmax(stats)
    extract = make_quant_ft_extract(ft_model, scales)
    assert extract.supports_s2d
    with pytest.raises(ValueError, match="eval-only"):
        extract(ft_vars, x, train=True)
    with pytest.raises(ValueError, match="even spatial"):
        extract(ft_vars, jnp.zeros((1, 8, 31, 31, 3)))
    from ted_spad_tpu.models.i3d import InceptionI3d

    with pytest.raises(ValueError, match="WrapperI3D"):
        make_quant_ft_extract(InceptionI3d(num_classes=4), scales)


@pytest.mark.slow
def test_sharded_quant_extraction_matches_single_device(ft):
    """The quantized extract step under a 8-device data-parallel mesh: int8 convs +
    requant epilogues must compile and execute under GSPMD and match the
    single-device quantized run (inference sharding has no cross-shard reduction)."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.parallel import data_parallel_mesh, replicate, shard_batch
    from ted_spad_tpu.stages.feature_extraction import (
        make_extract_step,
        make_fa_calibration_step,
    )

    mesh = data_parallel_mesh()
    p = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32,
                                compute_dtype="float32")
    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    ft_model, ft_vars = load_ft_model("largei3d", num_classes=4, clip_shape=(8, 32, 32),
                                      dtype="float32")
    clips = np.random.default_rng(1).integers(0, 255, (8, 8, 48, 64, 3), dtype=np.uint8)
    calib = make_fa_calibration_step(p, fa_model, ft_model=ft_model)
    stats = calib(fa_vars, ft_vars, jnp.asarray(clips))
    scales = act_scales_from_absmax({k: float(v) for k, v in stats.items()})

    extract1 = make_extract_step(ft_model, p, fa=(fa_model, fa_vars),
                                 quant_act_scales=scales)
    ref = extract1(ft_vars, jnp.asarray(clips))

    ft_r, fa_r = replicate(mesh, ft_vars), replicate(mesh, fa_vars)
    extract8 = make_extract_step(ft_model, p, fa=(fa_model, fa_r), mesh=mesh,
                                 quant_act_scales=scales)
    feats = extract8(ft_r, shard_batch(mesh, jnp.asarray(clips)))
    assert len(feats.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref), rtol=2e-4, atol=1e-4)


@pytest.mark.slow
def test_quant_features_score_like_bf16_through_mgfn(tmp_path):
    """Downstream agreement: features extracted with quant='int8' must score the
    same videos (MGFN masked-bucket inference) essentially like the bf16 features —
    the consumer-level statement of the fidelity claim."""
    from ted_spad_tpu.config.params import FeatureExtractionParams, MGFNParams
    from ted_spad_tpu.data.features import padded_test_batch
    from ted_spad_tpu.models import load_mgfn_model
    from ted_spad_tpu.ops.temporal import test_features
    from ted_spad_tpu.stages.anomaly_detection import make_score_fn
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = FeatureExtractionParams(num_frames=8, fix_skip=2, batch_size=4,
                                reso_h=32, reso_w=32, anonymized=True,
                                compute_dtype="float32")
    uris = [f"synthetic://n=80,h=48,w=64,seed={i}" for i in range(2)]
    r_bf = extract_features(p, uris, str(tmp_path / "bf16"), decode_hw=(48, 64),
                            log_fn=lambda s: None)
    r_q = extract_features(
        p.replace(quant="int8", quant_calib_batches=1, quant_fidelity_check=False),
        uris, str(tmp_path / "int8"), decode_hw=(48, 64), log_fn=lambda s: None)

    mp = MGFNParams(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16)
    model, variables = load_mgfn_model(mp, ncrops=1)
    score = make_score_fn(model)
    for u in uris:
        vb, mb, _ = padded_test_batch(test_features(np.load(r_bf["saved"][u])))
        vq, mq, _ = padded_test_batch(test_features(np.load(r_q["saved"][u])))
        sb = np.asarray(score(variables, jnp.asarray(vb), jnp.asarray(mb)))
        sq = np.asarray(score(variables, jnp.asarray(vq), jnp.asarray(mq)))
        assert np.isfinite(sb).all() and np.isfinite(sq).all()
        assert np.abs(sb - sq).max() < 0.05, np.abs(sb - sq).max()


def test_combined_calibration_merges_sites(ft):
    """make_fa_calibration_step(ft_model=...) returns the union of fa and ft sites
    with no collisions, on the serving preprocess."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model
    from ted_spad_tpu.stages.feature_extraction import make_fa_calibration_step

    ft_model, ft_vars = ft
    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    p = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32,
                                compute_dtype="float32")
    calib = make_fa_calibration_step(p, fa_model, ft_model=ft_model)
    clips = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 8, 48, 64, 3), dtype=np.uint8)
    )
    stats = calib(fa_vars, ft_vars, clips)
    ft_sites = {k for k in stats if k.startswith("i3d_")}
    fa_sites = set(stats) - ft_sites
    assert len(ft_sites) > 10 and len(fa_sites) >= 25
    scales = act_scales_from_absmax({k: float(v) for k, v in stats.items()})
    assert all(v > 0 for v in scales.values())
