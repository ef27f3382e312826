"""Tests for the W8A8 int8 serving path (ops/quant_unetpp.py).

Three layers of evidence: (1) the quantization arithmetic is exactly what the
spec says (int8 codes, int32 accumulation, per-channel dequant); (2) the
calibration forward IS the production bf16 schedule (module-apply parity — so
calibrated scales describe the tensors the int8 program actually sees); (3) the
quantized network stays close to the bf16 reference end to end, including the
s2d-bridged head and the extraction driver integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ted_spad_tpu.models import load_fa_model
from ted_spad_tpu.ops.quant_unetpp import (
    QT,
    _Quantizer,
    act_scales_from_absmax,
    calibrate_unetpp,
    fast_unetpp_apply_q,
    make_quant_fa_apply,
    quantize_weight,
)


class TestQuantPrimitives:
    def test_weight_quant_roundtrip_bound(self):
        """Per-Cout symmetric quantization: |w - wq*s| <= s/2 everywhere, and the
        extreme element of every channel round-trips exactly (it defines the scale)."""
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16)) * jnp.linspace(
            0.01, 3.0, 16
        )
        wq, s = quantize_weight(w)
        assert wq.dtype == jnp.int8 and s.shape == (16,)
        err = np.abs(np.asarray(w) - np.asarray(wq).astype(np.float32) * np.asarray(s))
        assert (err <= np.asarray(s)[None, None, None, :] / 2 + 1e-7).all()
        assert int(np.abs(np.asarray(wq)).max()) == 127

    def test_act_scales_clamped(self):
        scales = act_scales_from_absmax({"a": 12.7, "dead": 0.0})
        assert scales["a"] == pytest.approx(0.1)
        assert scales["dead"] > 0  # an all-zero calibration tensor must not 1/0

    def test_qconv_matches_dequantized_f32_conv(self):
        """Run-mode conv == f32 conv over the DEQUANTIZED int values: the int8 MXU
        path accumulates in int32 (exact), and at Cin=8 the f32 oracle is exact too
        (max |sum| = 9*8*127^2 ~ 1.2e6 < 2^24), so the match is bitwise in f32."""
        qz = _Quantizer("run", {"x": 0.05}, jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 12, 8), minval=-3, maxval=3)
        w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 4))
        qx = qz.q8("x", x)
        got = qz.conv(qx, w)
        wq, sw = quantize_weight(w)
        # Integer conv evaluated in f32 is exact here (per-product <= 127^2, sums
        # <= 1.2e6 < 2^24); scaling AFTER accumulation matches the int32 path's
        # order of operations bitwise.
        ref = jax.lax.conv_general_dilated(
            qx.data.astype(jnp.float32), wq.astype(jnp.float32),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) * (0.05 * sw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)

    def test_q8_saturates_and_rounds(self):
        qz = _Quantizer("run", {"x": 1.0}, jnp.float32)
        q = qz.q8("x", jnp.asarray([0.4, 0.6, -200.0, 200.0, 126.5]))
        np.testing.assert_array_equal(np.asarray(q.data), [0, 1, -127, 127, 126])

    def test_int8_maxpool_equals_float_maxpool(self):
        """Pooling int8 codes == pooling dequantized values (max is monotone)."""
        from ted_spad_tpu.ops.fast_unetpp import _resnet_maxpool

        qz = _Quantizer("run", {"x": 0.1}, jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 9, 11, 4), minval=0, maxval=12)
        qx = qz.q8("x", x)
        pooled = qz.maxpool(qx)
        ref = _resnet_maxpool(qx.data.astype(jnp.float32) * 0.1)
        np.testing.assert_allclose(
            np.asarray(pooled.data).astype(np.float32) * pooled.scale, np.asarray(ref)
        )

    def test_run_mode_requires_scales(self):
        with pytest.raises(ValueError, match="calibrat"):
            _Quantizer("run", None, jnp.float32)
        with pytest.raises(KeyError):
            _Quantizer("run", {"other": 1.0}, jnp.float32).q8("missing", jnp.ones(3))


class TestQuantForward:
    @pytest.fixture(scope="class")
    def fa(self):
        return load_fa_model(image_size=(64, 64), dtype="float32")

    @pytest.fixture(scope="class")
    def calibrated(self, fa):
        fa_model, fa_vars = fa
        x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
        out, stats = jax.jit(
            lambda v, f: calibrate_unetpp(v, f, dtype=jnp.float32)
        )(fa_vars, x)
        return x, out, {k: np.asarray(v) for k, v in stats.items()}

    def test_calibration_forward_matches_module(self, fa, calibrated):
        """The calibration pass runs the PRODUCTION schedule: its output must match
        the module apply — otherwise the recorded absmaxes describe some other net."""
        fa_model, fa_vars = fa
        x, out, stats = calibrated
        ref = fa_model.apply(fa_vars, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
        # Every quantize site of the run path appears (KeyError otherwise) and
        # absmaxes are positive finite.
        assert len(stats) >= 25
        assert all(np.isfinite(v) and v >= 0 for v in stats.values())

    def test_quantized_close_to_reference(self, fa, calibrated):
        """End-to-end W8A8 fidelity on a random-init model (a floor — trained BN
        statistics only tighten activation ranges): PSNR over the output span."""
        fa_model, fa_vars = fa
        x, _, stats = calibrated
        scales = act_scales_from_absmax(stats)
        ref = fa_model.apply(fa_vars, x, train=False)
        q = jax.jit(
            lambda v, f: fast_unetpp_apply_q(v, f, scales, dtype=jnp.float32)
        )(fa_vars, x)
        r, g = np.asarray(ref), np.asarray(q)
        span = r.max() - r.min()
        psnr = 10 * np.log10(span**2 / np.mean((r - g) ** 2))
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert psnr > 28.0, psnr
        assert corr > 0.97, corr

    def test_emit_s2d_matches_plain_head(self, fa, calibrated):
        """The s2d-bridged head over the quantized trunk == space-to-depth of the
        plain head output (same x_0_3, exact kernel re-binning)."""
        from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

        fa_model, fa_vars = fa
        x, _, stats = calibrated
        scales = act_scales_from_absmax(stats)
        fine = fast_unetpp_apply_q(fa_vars, x, scales, dtype=jnp.float32)
        s2d = fast_unetpp_apply_q(fa_vars, x, scales, dtype=jnp.float32, emit_s2d=True)
        assert s2d.shape == (2, 32, 32, 12)
        np.testing.assert_allclose(
            np.asarray(s2d), np.asarray(space_to_depth_2x2(fine.astype(jnp.float32))),
            rtol=1e-4, atol=1e-4,
        )

    def test_make_quant_fa_apply_guards(self, fa, calibrated):
        fa_model, fa_vars = fa
        x, _, stats = calibrated
        scales = act_scales_from_absmax(stats)
        apply = make_quant_fa_apply(fa_model, fa_vars, scales)
        assert apply.supports_s2d
        with pytest.raises(ValueError, match="eval-only"):
            apply(fa_vars, x, train=True)
        with pytest.raises(ValueError, match="16-aligned"):
            apply(fa_vars, jnp.zeros((1, 24, 24, 3)))
        # Non-standard configs refuse loudly instead of silently serving bf16.
        tiny_model, tiny_vars = load_fa_model(image_size=(32, 32), dtype="float32", tiny=True)
        with pytest.raises(ValueError, match="standard"):
            make_quant_fa_apply(tiny_model, tiny_vars, scales)


@pytest.mark.slow
def test_extraction_quant_int8_e2e(tmp_path):
    """extract_features with quant='int8': calibrates on its own leading batches,
    extracts everything (calibration batches included), and reports feature-level
    fidelity vs the bf16 path in the returned stats."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = FeatureExtractionParams(
        num_frames=8, fix_skip=2, batch_size=4, reso_h=32, reso_w=32,
        anonymized=True, compute_dtype="float32", quant="int8", quant_calib_batches=1,
    )
    uris = [f"synthetic://n=80,h=48,w=64,seed={i}" for i in range(2)]
    res = extract_features(p, uris, str(tmp_path / "feats"), decode_hw=(48, 64),
                           log_fn=lambda s: None)
    assert len(res["saved"]) == 2
    assert res["quant_calib_batches_used"] == 1
    assert res["quant_feature_cossim_vs_bf16"] > 0.95
    for path in res["saved"].values():
        feat = np.load(path)
        assert feat.shape[1] == 2048 and np.isfinite(feat).all()


def test_extraction_quant_requires_fa():
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = FeatureExtractionParams(anonymized=False, quant="int8")
    with pytest.raises(ValueError, match="anonymized"):
        extract_features(p, ["synthetic://n=8"], "/tmp/x", log_fn=lambda s: None)
