"""W8A8 post-training quantization for the fused UNet++ eval path (serving/extraction).

Why: the extraction program runs at 99.7% of its computed bf16 MFU ceiling
(hw_checklist/block_anatomy.json) — the remaining headroom is precision-level. The
v5e MXU runs int8 at 394 TOPS vs 197 TFLOP/s bf16, and the measured decoder-shape
convs hit 1.6-1.8x bf16 on the chip (scripts/exp_int8_conv.py ->
hw_checklist/exp_int8_conv_r5.log: 224^2 32->32 2.049 -> 1.198 ms; 112^2 64->64
1.481 -> 0.909 ms; the fused requantize epilogue is free). fa's encoder+decoder is
41.5 of the program's 52.65 ms, so an int8 fa is the one lever that can lift the
program past the bf16 sum-of-parts ceiling.

Scheme (standard post-training W8A8, no retraining):
  - Weights: per-output-channel symmetric int8, scale = absmax/127, quantized at
    trace time from the UNCHANGED f32 checkpoint (re-binned up2/s2d kernels are
    quantized AFTER re-binning, so the tap algebra stays exact in f32). Weight
    quantization is ~20 M elementwise ops per step — noise against the 35 ms
    decoder — and keeps the checkpoint the single source of truth (no parallel
    quantized param tree to version or drift).
  - Activations: per-tensor symmetric int8. Scales come from a calibration pass
    (``calibrate_unetpp``: the SAME schedule run in bf16, recording per-site
    absmax as jit outputs) over representative batches.
  - Convs: ``conv_general_dilated(int8, int8) -> int32`` (exact integer
    accumulation on the MXU int8 path), dequantized by the per-channel
    ``act_scale * weight_scale`` epilogue, then the usual folded-BN affine + ReLU
    in f32/bf16, and re-quantization to int8 at the next site — all fused by XLA
    into the conv epilogue (measured: requant adds ~0 ms).
  - The stem (Cin=3, lane-bound, 0.8 ms) and the head (Cout 3/12, 1.3 ms) stay
    bf16: their cost is layout-bound, not MXU-bound, and they bracket the network
    where quantization error costs the most fidelity per ms saved.

Calibration and run mode execute the SAME forward (``_qforward``), so the set of
recorded sites and the set of consumed sites cannot drift. Both reuse
``fast_unetpp._decoder_schedule`` — the exact schedule of the production bf16
path — via its ``conv``/``block`` plug points.

This is an OPT-IN serving mode (extraction ``quant='int8'``): it changes numerics
(the anonymizer's outputs differ at int8 resolution), so the default path stays
bf16 and callers get fidelity metrics (``quant_fidelity``) against the bf16
reference to decide. The reference has no counterpart (its extraction is f32
torch, dali_extraction.py:168-179); this is TPU-hardware headroom the reference
leaves unused.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ted_spad_tpu.ops.fast_unetpp import (
    _R18_ENC_LAYERS,
    _apply_head,
    _bn_affine,
    _decoder_schedule,
    _pad_to,
    _resnet_maxpool,
    _stem_conv,
    encoder_layout_standard,
    up2_dilated_kernel,
)

Array = jax.Array


class QT(NamedTuple):
    """A quantized activation: int8 data + its python-float scale (run mode), or
    the plain ``dtype`` tensor + ``None`` (calibration mode). Block outputs and
    skip-conv INPUTS travel as QT through ``_decoder_schedule``; conv outputs are
    always plain tensors."""

    data: Array
    scale: float | None


def weight_qscale(w: Array) -> Array:
    """Per-output-channel symmetric int8 scale for a (..., Cout) kernel."""
    a = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    return jnp.maximum(a, 1e-8) / 127.0


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """(kernel f32) -> (int8 kernel, per-Cout f32 scale). Round-to-nearest-even."""
    w = w.astype(jnp.float32)
    s = weight_qscale(w)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def act_scales_from_absmax(stats: dict) -> dict[str, float]:
    """Calibration absmax per site -> symmetric int8 scales (clamped: an all-zero
    calibration tensor must not produce a 0 scale / inf inverse)."""
    return {k: max(float(v), 1e-6) / 127.0 for k, v in stats.items()}


class _Quantizer:
    """Mode 'run': int8 compute with static per-site activation scales.
    Mode 'calib': identical schedule in ``dtype``, recording per-site absmax into
    ``self.stats`` (jit-output scalars). One code path serves both, so recorded
    sites == consumed sites by construction."""

    def __init__(self, mode: str, act_scales: dict | None, dtype):
        assert mode in ("run", "calib"), mode
        if mode == "run" and not act_scales:
            raise ValueError("run mode needs calibrated act_scales (calibrate_unetpp)")
        self.mode = mode
        self.act = act_scales or {}
        self.dtype = dtype
        self.stats: dict[str, Array] = {}

    def q8(self, site: str, x: Array) -> QT:
        """Quantize an activation tensor at a named site (or record its absmax)."""
        if self.mode == "calib":
            self.stats[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            return QT(x.astype(self.dtype), None)
        s = float(self.act[site])
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)), -127, 127)
        return QT(q.astype(jnp.int8), s)

    def dequant(self, qx: QT) -> Array:
        if self.mode == "calib":
            return qx.data
        return (qx.data.astype(jnp.float32) * qx.scale).astype(self.dtype)

    def conv(self, qx: QT, w: Array, *, strides=(1, 1), padding="SAME",
             lhs_dilation=None) -> Array:
        """One quantized conv: int8 x int8 -> int32 on the MXU, dequantized by the
        fused per-channel epilogue. Calib mode: the same conv in ``dtype``.
        Rank-generic: 4-D operands run NHWC, 5-D run NDHWC (the I3Res50 path)."""
        dn = (
            ("NDHWC", "DHWIO", "NDHWC") if qx.data.ndim == 5 else ("NHWC", "HWIO", "NHWC")
        )
        if self.mode == "calib":
            return jax.lax.conv_general_dilated(
                qx.data.astype(self.dtype), w.astype(self.dtype), strides, padding,
                lhs_dilation=lhs_dilation, dimension_numbers=dn,
                preferred_element_type=self.dtype,
            )
        wq, sw = quantize_weight(w)
        y = jax.lax.conv_general_dilated(
            qx.data, wq, strides, padding, lhs_dilation=lhs_dilation,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (qx.scale * sw)).astype(self.dtype)

    def maxpool(self, qx: QT) -> QT:
        """The r18 stem maxpool on the quantized tensor directly — max is monotone,
        so pooling int8 codes IS pooling the dequantized values (scale-preserving,
        and the pooled tensor moves at 1 byte/px)."""
        if self.mode == "calib":
            return QT(_resnet_maxpool(qx.data), None)
        x = qx.data
        lo = jnp.int8(jnp.iinfo(jnp.int8).min)
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=lo)
        y = jax.lax.reduce_window(xp, lo, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        return QT(y, qx.scale)

    def maxpool_valid(self, qx: QT, window, strides) -> QT:
        """torch MaxPool padding=0 (VALID) over the leading-batch/trailing-channel
        layout, any spatial rank — scale-preserving on int8 codes like ``maxpool``."""
        win = (1,) + tuple(window) + (1,)
        st = (1,) + tuple(strides) + (1,)
        if self.mode == "calib":
            from ted_spad_tpu.models.layers import max_pool_valid

            return QT(max_pool_valid(qx.data, window, strides), None)
        lo = jnp.int8(jnp.iinfo(jnp.int8).min)
        y = jax.lax.reduce_window(qx.data, lo, jax.lax.max, win, st, "VALID")
        return QT(y, qx.scale)


def _affine_relu(y: Array, p_bn: dict, s_bn: dict, dtype, *, relu: bool = True) -> Array:
    sc, bi = _bn_affine(p_bn, s_bn)
    y = y * sc.astype(y.dtype) + bi.astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def _qbasic(qz: _Quantizer, p: dict, s: dict, qx: QT, stride: int, site: str) -> Array:
    """Quantized torchvision BasicBlock (mirrors fast_unetpp._basic_block_eval).
    Returns the plain pre-quantization output; the caller quantizes at the block's
    out site (shared with every downstream consumer of this tensor)."""
    y = qz.conv(qx, p["conv1"]["conv"]["kernel"], strides=(stride, stride),
                padding=[(1, 1), (1, 1)])
    y = _affine_relu(y, p["conv1"]["bn"], s["conv1"]["bn"], qz.dtype)
    yq = qz.q8(f"{site}_mid", y)
    y = qz.conv(yq, p["conv2"]["conv"]["kernel"], padding=[(1, 1), (1, 1)])
    y = _affine_relu(y, p["conv2"]["bn"], s["conv2"]["bn"], qz.dtype, relu=False)
    if "downsample" in p:
        r = qz.conv(qx, p["downsample"]["conv"]["kernel"], strides=(stride, stride),
                    padding=[(0, 0), (0, 0)])
        r = _affine_relu(r, p["downsample"]["bn"], s["downsample"]["bn"], qz.dtype, relu=False)
    else:
        # Exact residual recovery: the int8 code times its scale IS the value the
        # rest of the net saw — no second quantization error on the skip.
        r = qz.dequant(qx)
    return jax.nn.relu(y + r)


# Encoder block whose output IS a decoder skip feature: alias its out site to the
# decoder-side f-name so the tensor is quantized exactly once with one scale.
_F_ALIAS = {("layer1", 1): "f2", ("layer2", 1): "f1", ("layer3", 1): "f0"}


def _qencoder(qz: _Quantizer, p_enc: dict, s_enc: dict, frames: Array) -> list[QT]:
    """Quantized r18 encoder. The stem (Cin=3, lane-bound) stays in ``dtype``; its
    ReLU output is quantized once at site 'f3' (it is both layer1's input — via
    the scale-preserving int8 maxpool — and the decoder's /2 skip feature).
    Returns the decoder's f list [f0(/16), f1(/8), f2(/4), f3(/2)] as QTs."""
    y = _stem_conv(p_enc["stem"], frames, qz.dtype, "plain")
    f1 = _affine_relu(y, p_enc["stem"]["bn"], s_enc["stem"]["bn"], qz.dtype)
    f3 = qz.q8("f3", f1)
    x = qz.maxpool(f3)
    feats = [f3]
    for lname, nblocks, stride in _R18_ENC_LAYERS:
        for i in range(nblocks):
            site = f"enc_{lname}_{i}"
            z = _qbasic(qz, p_enc[f"{lname}_{i}"], s_enc[f"{lname}_{i}"], x,
                        stride if i == 0 else 1, site)
            x = qz.q8(_F_ALIAS.get((lname, i), f"{site}_out"), z)
        feats.append(x)
    return feats[::-1]


def _qdecoder(qz: _Quantizer, p: dict, st: dict, f: list, up2_int8: bool = False) -> Array:
    """The quantized nested-skip decoder over the f list of QTs — the decoder part
    of ``_qforward``, exposed for per-segment measurement (scripts/bench_blocks.py).
    Returns x_0_3 (plain ``dtype``, pre-head)."""

    def blk(name: str, xin: QT, skip_sum):
        pb, sb = p[name], st[name]
        w1 = pb["conv1"]["conv"]["kernel"].astype(jnp.float32)
        cx = xin.data.shape[-1]
        # Quantize the RE-BINNED (4,4) kernel: the tap algebra stays exact in f32,
        # and summed taps never have to fit int8 themselves.
        w44 = up2_dilated_kernel(w1[:, :, :cx, :])
        if up2_int8:
            y = qz.conv(xin, w44, padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2))
        else:
            # MEASURED (hw_checklist/exp_int8_up2_r5.log): the lhs-dilated up2 form
            # gains nothing from int8 on v5e (bf16 2.199 vs int8 2.331 ms at the
            # 112^2 64->32 shape — XLA's parity decomposition already runs it at
            # 215-390 T/s effective), so the up2 convs run bf16 on the dequantized
            # int8 input while the plain 3x3s (1.6-1.8x int8 win) stay quantized.
            xd = qz.dequant(xin)
            y = jax.lax.conv_general_dilated(
                xd, w44.astype(qz.dtype), (1, 1), [(2, 2), (2, 2)],
                lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=qz.dtype,
            )
        if skip_sum is not None:
            y = _pad_to(y, skip_sum.shape) + skip_sum
        y = _affine_relu(y, pb["conv1"]["bn"], sb["conv1"]["bn"], qz.dtype)
        yq = qz.q8(f"{name}_mid", y)
        z = qz.conv(yq, pb["conv2"]["conv"]["kernel"])
        if "bias" in pb["conv2"]["conv"]:
            z = z + pb["conv2"]["conv"]["bias"].astype(z.dtype)
        z = _affine_relu(z, pb["conv2"]["bn"], sb["conv2"]["bn"], qz.dtype)
        if name == "x_0_3":
            return z  # feeds the bf16 head — never quantized
        return qz.q8(f"{name}_out", z)

    def conv(site: str, qx: QT, w: Array) -> Array:
        return qz.conv(qx, w)

    return _decoder_schedule(p, f, qz.dtype, blk, conv=conv)


def _qforward(qz: _Quantizer, variables: dict, frames: Array, emit_s2d: bool,
              up2_int8: bool = False) -> Array:
    p, st = variables["params"], variables["batch_stats"]
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    f = _qencoder(qz, p["encoder"], st["encoder"], frames)
    x_0_3 = _qdecoder(qz, p, st, f, up2_int8)
    return _apply_head(p["head"], x_0_3, in_h, in_w, qz.dtype, emit_s2d)


def calibrate_unetpp(variables: dict, frames: Array, *, dtype=jnp.bfloat16,
                     emit_s2d: bool = False):
    """Jittable calibration pass: the quantization schedule in ``dtype``, returning
    ``(out, {site: absmax f32 scalar})``. Run over representative batches, reduce
    absmax with max across batches, then ``act_scales_from_absmax``."""
    qz = _Quantizer("calib", None, dtype)
    out = _qforward(qz, variables, frames, emit_s2d)
    return out, qz.stats


def fast_unetpp_apply_q(variables: dict, frames: Array, act_scales: dict[str, float],
                        *, dtype=jnp.bfloat16, emit_s2d: bool = False,
                        up2_int8: bool = False) -> Array:
    """Quantized fused eval forward over the UNCHANGED UNetPlusPlus variable tree.
    ``act_scales``: per-site scales from ``calibrate_unetpp`` +
    ``act_scales_from_absmax`` (python floats — baked into the program).
    ``up2_int8``: quantize the lhs-dilated up2 convs too (measured no-gain on v5e,
    kept for other generations/shapes — see the in-block comment)."""
    qz = _Quantizer("run", act_scales, dtype)
    return _qforward(qz, variables, frames, emit_s2d, up2_int8)


def make_quant_fa_apply(fa_model, fa_vars, act_scales: dict[str, float],
                        up2_int8: bool = False):
    """Quantized drop-in for ``make_fast_fa_apply``'s eval path: returns
    ``apply(variables, frames, train=False, emit_s2d=False)``. Requires the
    standard reference configuration (UNetPlusPlus, decoder (256,128,64,32),
    standard r18 encoder layout) — anything else raises: a silent bf16 fallback
    would misreport what a '--quant int8' run actually measured."""
    from ted_spad_tpu.models.unet import UNetPlusPlus

    if (
        not isinstance(fa_model, UNetPlusPlus)
        or "batch_stats" not in fa_vars
        or tuple(fa_model.decoder_channels) != (256, 128, 64, 32)
        or not encoder_layout_standard(fa_vars["params"].get("encoder", {}))
    ):
        raise ValueError(
            "quant='int8' supports the standard UNet++ (r18 encoder, decoder "
            "(256,128,64,32)) eval path only"
        )
    dtype = fa_model.dtype

    def apply(variables, frames, train=False, emit_s2d=False, **kw):
        if train or kw:
            raise ValueError("quantized fa is an eval-only serving path")
        h, w = frames.shape[-3], frames.shape[-2]
        if h % 16 or w % 16:
            raise ValueError(f"quantized fa needs 16-aligned spatial dims, got {h}x{w}")
        return fast_unetpp_apply_q(variables, frames, act_scales, dtype=dtype,
                                   emit_s2d=emit_s2d, up2_int8=up2_int8)

    apply.supports_s2d = fa_model.out_channels == 3
    return apply
