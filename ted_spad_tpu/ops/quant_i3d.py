"""W8A8 int8 eval path for the I3Res50 "largei3d" ft backbone (serving/extraction).

Companion to ops/quant_unetpp.py: after the fa anonymizer went int8, the ft
segments (stem 4.08 ms + backbone 3.95 ms of the 41.3 ms int8 extraction
program, hw_checklist/block_anatomy.json + bench_quant_r5.log) are the remaining
MXU time. Measured on the chip (hw_checklist/exp_int8_up2_r5.log) the 3D conv
families gain 1.3-1.6x on the int8 MXU path, so the backbone's Bottleneck3D
convs quantize; the s2d stem (12 of 128 input lanes, layout-bound) is offered in
both precisions behind ``stem_int8`` and decided by measurement.

Same scheme and the same ``_Quantizer`` as the fa path (per-Cout symmetric int8
weights quantized at trace time from the unchanged checkpoint; per-tensor
calibrated activation scales; int32 MXU accumulation with fused dequant+BN+ReLU+
requant epilogues; scale-preserving int8 VALID maxpools). Calibration and run
execute the SAME forward, so recorded and consumed sites cannot drift. All ft
act sites are prefixed ``i3d_`` — fa and ft scales live in one flat dict.

Reference semantics: large_i3d.py Bottleneck:42 / I3Res50:130 eval forward with
eval-mode BN; the quantized path requires ``use_nl=False`` (the shipped config,
model_loaders.py:262) and refuses otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2, stem_s2d_kernel
from ted_spad_tpu.ops.quant_unetpp import QT, _affine_relu, _Quantizer

Array = jax.Array


def _qbottleneck(qz: _Quantizer, p: dict, s: dict, qx: QT, stride: int, tc: int,
                 site: str) -> Array:
    """Quantized Bottleneck3D eval forward (models/i3res50.py:55-99): temporal
    (1+2tc,1,1) conv -> (1,3,3) spatial stride conv -> 1x1x1 expand, + residual.
    Returns the plain pre-quantization output (the caller owns the out site)."""
    y = qz.conv(qx, p["conv1"]["conv"]["kernel"], strides=(1, 1, 1),
                padding=[(tc, tc), (0, 0), (0, 0)])
    y = _affine_relu(y, p["conv1"]["bn"], s["conv1"]["bn"], qz.dtype)
    yq = qz.q8(f"{site}_c1", y)
    y = qz.conv(yq, p["conv2"]["conv"]["kernel"], strides=(1, stride, stride),
                padding=[(0, 0), (1, 1), (1, 1)])
    y = _affine_relu(y, p["conv2"]["bn"], s["conv2"]["bn"], qz.dtype)
    yq = qz.q8(f"{site}_c2", y)
    y = qz.conv(yq, p["conv3"]["conv"]["kernel"], strides=(1, 1, 1),
                padding=[(0, 0), (0, 0), (0, 0)])
    y = _affine_relu(y, p["conv3"]["bn"], s["conv3"]["bn"], qz.dtype, relu=False)
    if "downsample" in p:
        r = qz.conv(qx, p["downsample"]["conv"]["kernel"], strides=(1, stride, stride),
                    padding=[(0, 0), (0, 0), (0, 0)])
        r = _affine_relu(r, p["downsample"]["bn"], s["downsample"]["bn"], qz.dtype,
                         relu=False)
    else:
        r = qz.dequant(qx)
    return jax.nn.relu(y + r)


def _q_backbone(qz: _Quantizer, p: dict, s: dict, y: Array, layer_specs) -> Array:
    """Backbone from the stem's ReLU output to the pooled (B, 2048) f32 features —
    the post-stem part of ``_q_features``, exposed for per-segment measurement
    (scripts/bench_blocks.py --quant)."""
    xq = qz.q8("i3d_in", y)
    xq = qz.maxpool_valid(xq, (2, 3, 3), (2, 2, 2))
    last = (len(layer_specs) - 1, layer_specs[-1][1] - 1)
    out = None
    for li, (planes, n_blocks, stride, temp_conv) in enumerate(layer_specs):
        for bi in range(n_blocks):
            name = f"blocks_layer{li + 1}_{bi}"
            z = _qbottleneck(
                qz, p[name], s[name], xq, stride if bi == 0 else 1, temp_conv[bi],
                f"i3d_l{li + 1}_{bi}",
            )
            if (li, bi) == last:
                out = z  # feeds the f32 average pool — never quantized
            else:
                xq = qz.q8(f"i3d_l{li + 1}_{bi}_out", z)
        if li == 0:
            xq = qz.maxpool_valid(xq, (2, 1, 1), (2, 1, 1))
    # AdaptiveAvgPool to (B, C) in f32 (models/layers.py:global_avg_pool).
    return jnp.mean(out.astype(jnp.float32), axis=tuple(range(1, out.ndim - 1)))


def _q_features(qz: _Quantizer, variables: dict, x: Array, layer_specs,
                input_s2d: bool, stem_int8: bool) -> Array:
    """Stem + backbone + global average pool == I3Res50.features in eval mode
    (models/i3res50.py:170-190), on the s2d input layout (ops/fast_i3d.py)."""
    p, s = variables["params"]["i3d"], variables["batch_stats"]["i3d"]
    ws = stem_s2d_kernel(p["stem"]["conv"]["kernel"].astype(jnp.float32))
    xs = x.astype(qz.dtype) if input_s2d else space_to_depth_2x2(x.astype(qz.dtype))
    if stem_int8:
        y = qz.conv(qz.q8("i3d_stem_in", xs), ws, strides=(2, 1, 1),
                    padding=[(2, 2), (2, 1), (2, 1)])
    else:
        y = jax.lax.conv_general_dilated(
            xs, ws.astype(qz.dtype), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=qz.dtype,
        )
    y = _affine_relu(y, p["stem"]["bn"], s["stem"]["bn"], qz.dtype)
    return _q_backbone(qz, p, s, y, layer_specs)


def _check_supported(ft_model) -> None:
    from ted_spad_tpu.models.i3res50 import WrapperI3D

    if not isinstance(ft_model, WrapperI3D) or ft_model.use_nl:
        raise ValueError(
            "quantized ft supports the standard WrapperI3D (use_nl=False) only"
        )


def calibrate_i3d(ft_model, variables: dict, x: Array, *, input_s2d: bool = False):
    """Jittable calibration pass for the ft feature path: the quantization
    schedule in the model dtype, returning ``(feat2048, {site: absmax})``."""
    _check_supported(ft_model)
    qz = _Quantizer("calib", None, ft_model.dtype)
    feat = _q_features(qz, variables, x, ft_model.layer_specs, input_s2d,
                       stem_int8=False)
    # Record the stem-input absmax too so run mode can flip stem_int8 without a
    # second calibration pass (the site is only consumed when stem_int8=True).
    xs = x.astype(qz.dtype) if input_s2d else space_to_depth_2x2(x.astype(qz.dtype))
    qz.q8("i3d_stem_in", xs)
    return feat, qz.stats


def fast_i3d_features_q(ft_model, variables: dict, x: Array,
                        act_scales: dict[str, float], *, input_s2d: bool = False,
                        stem_int8: bool = False) -> Array:
    """Quantized ``extract_features`` over the UNCHANGED WrapperI3D variable tree:
    (B, T, H, W, 3) clips (or their 2x2-s2d layout with ``input_s2d``) ->
    (B, 2048) f32 pooled features."""
    _check_supported(ft_model)
    qz = _Quantizer("run", act_scales, ft_model.dtype)
    return _q_features(qz, variables, x, ft_model.layer_specs, input_s2d, stem_int8)


def make_quant_ft_extract(ft_model, act_scales: dict[str, float],
                          stem_int8: bool = False):
    """Quantized drop-in for ``make_fast_ft_extract``'s eval path: returns
    ``extract(variables, clips, train=False, input_s2d=False)``. Eval-only and
    even-spatial-dims only — loud errors, never a silent bf16 fallback."""
    _check_supported(ft_model)

    def extract(variables, x, train=False, input_s2d=False):
        if train or "batch_stats" not in variables:
            raise ValueError("quantized ft is an eval-only serving path")
        if not input_s2d and (x.shape[-2] % 2 or x.shape[-3] % 2):
            raise ValueError(
                f"quantized ft needs even spatial dims, got {x.shape[-3]}x{x.shape[-2]}"
            )
        return fast_i3d_features_q(ft_model, variables, x, act_scales,
                                   input_s2d=input_s2d, stem_int8=stem_int8)

    extract.supports_s2d = True
    return extract
