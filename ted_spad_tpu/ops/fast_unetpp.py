"""TPU-fast inference path for the UNet++ anonymizer (models/unet.py:88-130).

Why: the smp-style decoder upsamples with ``nearest_up2`` then convolves — at 224^2
with 32/64 output channels those convs use 25-50% of the 128-wide MXU lanes, and the
materialized upsampled tensors burn HBM bandwidth. Measured on v5e (64 frames, bf16):
x_0_3's ``up2 -> conv3x3(64->32)`` takes 6.0 ms; the fused form below takes 0.83 ms.

The identity used everywhere here::

    conv3x3(nearest_up2(x), W)  ==  depth_to_space(conv3x3(x, T(W)))

where ``T(W): (3,3,Cin,Cout) -> (3,3,Cin,4*Cout)`` re-bins the fine-resolution taps
onto the coarse grid per output parity (two fine taps landing on the same coarse
pixel sum their weights). Equal FLOPs, 4x output lanes, no upsample materialization.

This is a *pure function over the unchanged UNetPlusPlus param tree* — checkpoints,
converters and the training path are untouched; eval numerics match the module apply
to bf16 tolerance (weight re-association only). Reference semantics preserved:
smp UnetPlusPlus decoder (aux_code/model_loaders.py:18-30), eval-mode BN (running
stats folded into a post-conv affine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Remat boundary names emitted by ``fast_unetpp_train_apply`` (jax.ad_checkpoint
# checkpoint_name identities — numerically inert). With
# ``jax.checkpoint(policy=save_only_these_names(*TRAIN_REMAT_SAVE_NAMES))`` the
# adversarial backward keeps only these encoder features and decoder block
# outputs resident and rematerializes the within-block conv/BN intermediates —
# memory between full remat and none, backward recompute limited to one block
# at a time (stages/anonymization_training.py remat='blocks').
TRAIN_REMAT_SAVE_NAMES = (
    "fa_enc_f0",
    "fa_enc_f1",
    "fa_enc_f2",
    "fa_enc_f3",
    "fa_blk_x_0_0",
    "fa_blk_x_1_1",
    "fa_blk_x_2_2",
    "fa_blk_x_0_1",
    "fa_blk_x_1_2",
    "fa_blk_x_0_2",
    "fa_blk_x_0_3",
)

# Fine->coarse tap mixing per output parity: rows index the coarse offset (-1,0,+1),
# cols the fine kernel tap. Parity 0 fine taps {-1,0,1} land on coarse {-1,0,0};
# parity 1 taps land on coarse {0,0,+1}.
_M0 = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0], [0.0, 0.0, 0.0]], np.float32)
_M1 = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], np.float32)


def up2_fuse_kernel(w: Array) -> Array:
    """(3,3,Cin,Cout) -> (3,3,Cin,4*Cout): conv-after-nearest-up2 as a coarse conv.

    Output channel order is (py, px, cout) row-major, matching ``depth_to_space``.
    """
    mats = [jnp.asarray(_M0), jnp.asarray(_M1)]
    parts = [
        jnp.einsum("ae,bf,efio->abio", mats[py], mats[px], w)
        for py in (0, 1)
        for px in (0, 1)
    ]
    return jnp.concatenate(parts, axis=-1)


# Fine-tap -> 4-tap mixing for the lhs-dilated form: W4[j] = sum_{t in {0,1}}
# W3[2-j+t] (valid indices only), i.e. the 3x3 kernel correlated with a 2x2 box
# (nearest_up2 == zero-stuff then 2x2-box conv), then flipped for XLA's
# correlation semantics.
_D = np.zeros((4, 3), np.float32)
for _j in range(4):
    for _t in (0, 1):
        if 0 <= 2 - _j + _t <= 2:
            _D[_j, 2 - _j + _t] = 1.0
_DF = _D[::-1].copy()  # flip rows: correlation, not convolution


def up2_dilated_kernel(w: Array) -> Array:
    """(3,3,Cin,Cout) -> (4,4,Cin,Cout) kernel K with
    ``conv(x, K, lhs_dilation=2, padding=2) == conv3x3_SAME(nearest_up2(x))``.

    One op instead of coarse-conv + depth_to_space: XLA lowers the lhs-dilated conv
    with its own parity decomposition and keeps its preferred layouts end-to-end —
    measured 1.75x faster than the d2s form when chained into a consumer conv (v5e).
    """
    d = jnp.asarray(_DF)
    return jnp.einsum("ae,bf,efio->abio", d, d, w)


def up2_conv(x: Array, w3: Array, dtype) -> Array:
    """conv3x3_SAME(nearest_up2(x)) as a single lhs-dilated conv."""
    w44 = up2_dilated_kernel(w3)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w44.astype(dtype), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def depth_to_space(y: Array, cout: int) -> Array:
    """(N,H,W,4*cout) with (py,px,c)-major channels -> (N,2H,2W,cout)."""
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)


def _conv(x: Array, w: Array, dtype) -> Array:
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def _conv_wpack(x: Array, w: Array, r: int, dtype) -> Array:
    """SAME conv3x3 with ``r`` consecutive output columns packed into channels.

    Kernel (3, 2+r, Cin, r*Cout), stride (1, r): (2+r)/3 x FLOPs but r x MXU output
    lanes. NOTE: measured 1.94x faster for an isolated 112^2 64->64 on v5e, but
    consistently ~15% SLOWER when embedded in the full decoder (layout churn around
    the strided conv dominates) — so the production path below does NOT use it; it is
    kept for the regression test + scripts/microbench_fa.py record. Requires W % r == 0.
    """
    cout = w.shape[-1]
    kw = 2 + r
    wp = jnp.zeros((3, kw) + w.shape[2:3] + (r, cout), w.dtype)
    for j in range(r):
        wp = wp.at[:, j : j + 3, :, j, :].add(w)
    wp = wp.reshape(3, kw, w.shape[2], r * cout)
    # Padding goes through the conv op (not an explicit jnp.pad): an explicit pad
    # materializes a full copy of a 100-200MB activation at this batch scale.
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype), (1, r), [(1, 1), (1, r)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    n, h, wr, _ = y.shape
    return y.reshape(n, h, wr, r, cout).reshape(n, h, wr * r, cout)


def _conv3x3_best(x: Array, w: Array, dtype) -> Array:
    """Plain conv — width-packing measured slower in-network on v5e (see _conv_wpack)."""
    return _conv(x, w, dtype)


def _bn_affine(p_bn: dict, s_bn: dict, eps: float = 1e-5):
    """Eval-mode BatchNorm folded to (scale, bias), computed in f32."""
    scale = p_bn["scale"] / jnp.sqrt(s_bn["var"] + eps)
    bias = p_bn["bias"] - s_bn["mean"] * scale
    return scale, bias


def _convbn(x: Array, p: dict, s: dict, dtype, *, relu: bool = True) -> Array:
    """Standard ConvBN eval forward from a param subtree {conv:{kernel}, bn:{...}}."""
    y = _conv3x3_best(x, p["conv"]["kernel"], dtype)
    if "bias" in p["conv"]:
        y = y + p["conv"]["bias"].astype(dtype)
    scale, bias = _bn_affine(p["bn"], s["bn"])
    y = y * scale.astype(dtype) + bias.astype(dtype)
    return jax.nn.relu(y) if relu else y


def _pad_to(y: Array, target_shape) -> Array:
    """Center-pad y's spatial dims to match target (pad_to_match, models/layers.py:153)."""
    if y.shape[-3:-1] == tuple(target_shape[-3:-1]):
        return y
    dh = target_shape[-3] - y.shape[-3]
    dw = target_shape[-2] - y.shape[-2]
    return jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))


def _decoder_schedule(p: dict, f: list, dtype, block) -> Array:
    """The UNet++ nested-skip decoder with multi-consumer skip convs batched along
    Cout so each runs with full MXU lanes: f[2] feeds x_1_1 + x_0_1, f[3] feeds
    x_2_2 + x_1_2 + x_0_2, and x_2_2 feeds x_1_2 + x_0_2. Channel slices follow the
    module's concat layout (conv1 input = [up(x), *skips], models/unet.py:114-121).

    ``block(name, xin, skip_sum)`` runs one decoder block given the precomputed
    conv1 skip contribution — eval and train paths plug in their BN flavor.
    Returns x_0_3 (full-res, pre-head).
    """

    def w1(name):
        return p[name]["conv1"]["conv"]["kernel"]

    x_0_0 = block("x_0_0", f[0], _conv(f[1], w1("x_0_0")[:, :, 256:384, :], dtype))
    f2c = _conv(
        f[2],
        jnp.concatenate([w1("x_1_1")[:, :, 128:192, :], w1("x_0_1")[:, :, 320:384, :]], axis=-1),
        dtype,
    )  # (.., 64+128)
    f3c = _conv(
        f[3],
        jnp.concatenate(
            [
                w1("x_2_2")[:, :, 64:128, :],
                w1("x_1_2")[:, :, 128:192, :],
                w1("x_0_2")[:, :, 256:320, :],
            ],
            axis=-1,
        ),
        dtype,
    )  # (.., 64*3)
    x_1_1 = block("x_1_1", f[1], f2c[..., :64])
    x_2_2 = block("x_2_2", f[2], f3c[..., :64])
    x22c = _conv(
        x_2_2,
        jnp.concatenate([w1("x_1_2")[:, :, 64:128, :], w1("x_0_2")[:, :, 192:256, :]], axis=-1),
        dtype,
    )  # (.., 64+64)
    x_0_1 = block("x_0_1", x_0_0, _conv(x_1_1, w1("x_0_1")[:, :, 256:320, :], dtype) + f2c[..., 64:192])
    x_1_2 = block("x_1_2", x_1_1, x22c[..., :64] + f3c[..., 64:128])
    x_0_2 = block(
        "x_0_2",
        x_0_1,
        _conv(x_1_2, w1("x_0_2")[:, :, 128:192, :], dtype)
        + x22c[..., 64:128]
        + f3c[..., 128:192],
    )
    return block("x_0_3", x_0_2, None)


def _up_block_parts(x: Array, skip_sum: Array | None, p: dict, s: dict, dtype) -> Array:
    """Block forward when the skip contribution to conv1 is already computed
    (possibly as a slice of a batched multi-consumer conv)."""
    w1 = p["conv1"]["conv"]["kernel"]
    cx = x.shape[-1]
    y = up2_conv(x, w1[:, :, :cx, :], dtype)  # (N,2h,2w,F)
    if skip_sum is not None:
        y = _pad_to(y, skip_sum.shape) + skip_sum
    scale, bias = _bn_affine(p["conv1"]["bn"], s["conv1"]["bn"])
    y = jax.nn.relu(y * scale.astype(dtype) + bias.astype(dtype))
    return _convbn(y, p["conv2"], s["conv2"], dtype)


def head_s2d_kernel(w: Array) -> Array:
    """(3,3,Cin,Cout) -> (4,4,Cin,4*Cout) stride-2 kernel emitting the head output in
    2x2 space-to-depth layout ((py,px,c)-major channels), fusing the s2d transpose
    the downstream I3Res50 fast stem would otherwise pay (ops/fast_i3d.py)."""
    kh, kw, cin, cout = w.shape
    ws = jnp.zeros((4, 4, cin, 4, cout), w.dtype)
    for qy in (0, 1):
        for qx in (0, 1):
            for ky in range(3):
                for kx in range(3):
                    ws = ws.at[ky + qy, kx + qx, :, qy * 2 + qx, :].set(w[ky, kx])
    return ws.reshape(4, 4, cin, 4 * cout)


def fast_unetpp_apply(
    variables: dict, frames: Array, *, encoder_apply, dtype=jnp.bfloat16, emit_s2d: bool = False
) -> Array:
    """Fused eval forward of UNetPlusPlus (models/unet.py:100-130 semantics).

    ``variables``: the full UNetPlusPlus variable tree (params + batch_stats).
    ``encoder_apply``: callable (frames) -> encoder feature list — run the module's
    own ResNet2D encoder so its numerics/padding stay the module's.
    ``emit_s2d``: return (N, H/2, W/2, 12) space-to-depth output in ``dtype`` (for
    feeding the I3Res50 fast stem directly) instead of (N, H, W, 3) float32.
    """
    p, st = variables["params"], variables["batch_stats"]
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    feats = encoder_apply(frames)
    f = feats[1:][::-1]  # [/16(256), /8(128), /4(64), /2(64)]

    def blk(name, xin, skip_sum):
        return _up_block_parts(xin, skip_sum, p[name], st[name], dtype)

    x_0_3 = _decoder_schedule(p, f, dtype, blk)
    if x_0_3.shape[-3:-1] != (in_h, in_w):
        dh, dw = in_h - x_0_3.shape[-3], in_w - x_0_3.shape[-2]
        x_0_3 = jnp.pad(x_0_3, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))

    if emit_s2d:
        ws = head_s2d_kernel(p["head"]["kernel"])
        y = jax.lax.conv_general_dilated(
            x_0_3.astype(dtype), ws.astype(dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        return y + jnp.tile(p["head"]["bias"], 4).astype(dtype)

    out = _conv(x_0_3, p["head"]["kernel"], dtype) + p["head"]["bias"].astype(dtype)
    return out.astype(jnp.float32)


def _convbn_train(y: Array, p: dict, s: dict, dtype, *, relu: bool = True):
    """Train-mode ConvBN tail (BN batch stats + running update), mirroring flax
    BatchNorm exactly: f32 fast-variance stats, momentum 0.9, eps 1e-5
    (models/layers.py BN_MOMENTUM/BN_EPS; torch defaults)."""
    f = y.astype(jnp.float32)
    mean = f.mean((0, 1, 2))
    var = jnp.maximum(0.0, (f * f).mean((0, 1, 2)) - mean * mean)
    out = (f - mean) * jax.lax.rsqrt(var + 1e-5) * p["bn"]["scale"] + p["bn"]["bias"]
    out = out.astype(dtype)
    if relu:
        out = jax.nn.relu(out)
    m = 0.9
    new_stats = {
        "bn": {
            "mean": m * s["bn"]["mean"] + (1 - m) * mean,
            "var": m * s["bn"]["var"] + (1 - m) * var,
        }
    }
    return out, new_stats


def fast_unetpp_train_apply(variables: dict, frames: Array, *, encoder_module, dtype=jnp.bfloat16):
    """Fused TRAIN forward of UNetPlusPlus: same conv rewrites as the eval path
    (up2_conv folding, batched multi-consumer skip convs) with flax-exact BN batch
    statistics. Returns ``(out, {"batch_stats": updated})`` like
    ``module.apply(..., train=True, mutable=["batch_stats"])``.

    The rewrites are exact weight re-binnings, so conv outputs — and therefore the
    BN statistics computed from them — match the module to float tolerance, and
    gradients flow through the (linear) kernel transforms to the original params.
    """
    from jax.ad_checkpoint import checkpoint_name

    p, st = variables["params"], variables["batch_stats"]
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    enc_vars = {"params": p["encoder"], "batch_stats": st["encoder"]}
    feats, enc_mut = encoder_module.apply(
        enc_vars, frames, train=True, mutable=["batch_stats"]
    )
    new_stats: dict = {"encoder": enc_mut["batch_stats"]}
    f = [
        checkpoint_name(t, f"fa_enc_f{i}")
        for i, t in enumerate(feats[1:][::-1])
    ]

    def blk(name, xin, skip_sum):
        ww = p[name]["conv1"]["conv"]["kernel"]
        cx = xin.shape[-1]
        y = up2_conv(xin, ww[:, :, :cx, :], dtype)
        if skip_sum is not None:
            y = _pad_to(y, skip_sum.shape) + skip_sum
        y, s1 = _convbn_train(y, p[name]["conv1"], st[name]["conv1"], dtype)
        y = _conv(y, p[name]["conv2"]["conv"]["kernel"], dtype)
        y, s2 = _convbn_train(y, p[name]["conv2"], st[name]["conv2"], dtype)
        new_stats[name] = {"conv1": s1, "conv2": s2}
        return checkpoint_name(y, "fa_blk_" + name)

    x_0_3 = _decoder_schedule(p, f, dtype, blk)
    if x_0_3.shape[-3:-1] != (in_h, in_w):
        dh, dw = in_h - x_0_3.shape[-3], in_w - x_0_3.shape[-2]
        x_0_3 = jnp.pad(x_0_3, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    out = _conv(x_0_3, p["head"]["kernel"], dtype) + p["head"]["bias"].astype(dtype)
    return out.astype(jnp.float32), {"batch_stats": new_stats}


def make_fast_fa_apply(fa_model, fa_vars):
    """Return ``apply(variables, frames, train=False)`` using the fused decoder when
    the model is a UNetPlusPlus in eval; falls back to ``fa_model.apply`` otherwise.

    Drop-in for the fa forward in the extraction hot path
    (stages/feature_extraction.py; reference hot loop dali_extraction.py:168-179).
    """
    from ted_spad_tpu.models.unet import UNetPlusPlus

    # The batched multi-consumer weight slices in fast_unetpp_apply are derived for
    # the reference configuration (smp UnetPlusPlus resnet18 depth-4, decoder
    # (256,128,64,32) — model_loaders.py:18-30); any other width config falls back
    # to the module rather than silently slicing wrong weight blocks.
    if (
        not isinstance(fa_model, UNetPlusPlus)
        or "batch_stats" not in fa_vars
        or tuple(fa_model.decoder_channels) != (256, 128, 64, 32)
    ):
        def plain(variables, frames, train=False, emit_s2d=False, **kw):
            assert not emit_s2d, "emit_s2d requires the fused UNet++ path"
            return fa_model.apply(variables, frames, train=train, **kw)

        return plain

    dtype = fa_model.dtype

    from ted_spad_tpu.models.resnet2d import ResNet2D

    enc = ResNet2D(block="basic", layers=(2, 2, 2, 2), depth=4, dtype=dtype)

    def encoder_apply_from(variables):
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        return lambda x: enc.apply(enc_vars, x, train=False)

    def apply(variables, frames, train=False, emit_s2d=False, **kw):
        def fallback(train):
            out = fa_model.apply(variables, frames, train=train, **kw)
            if emit_s2d:
                from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

                out = space_to_depth_2x2(out.astype(dtype))
            return out

        # Fused path needs even spatial dims at every level (d2s alignment).
        h, w = frames.shape[-3], frames.shape[-2]
        if h % 16 or w % 16:
            return fallback(train)
        if train:
            # Fast train path only for the standard mutable-batch-stats call
            # (the anonymizer/recon trainers' shape, stages/*):
            if not emit_s2d and set(kw) == {"mutable"} and list(kw["mutable"]) == ["batch_stats"]:
                return fast_unetpp_train_apply(
                    variables, frames, encoder_module=enc, dtype=dtype
                )
            return fallback(True)
        return fast_unetpp_apply(
            variables, frames, encoder_apply=encoder_apply_from(variables), dtype=dtype,
            emit_s2d=emit_s2d,
        )

    # The s2d bridge feeds a stem expecting 4*3=12 channels; only advertise it for
    # the standard 3-channel RGB head.
    apply.supports_s2d = fa_model.out_channels == 3
    return apply
