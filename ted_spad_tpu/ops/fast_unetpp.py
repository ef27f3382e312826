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


def _conv_sp(x: Array, w: Array, strides, padding, dtype) -> Array:
    """General 2D conv with explicit strides/padding (NHWC/HWIO)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


# ---------------------------------------------------------------------------
# Fast ResNet-18 encoder: s2d re-binned stem + inline BasicBlocks
# ---------------------------------------------------------------------------
#
# The encoder stem is a 7x7 stride-2 conv with Cin=3 — the same lane-starved
# shape class as the I3Res50 stem (3 of 128 MXU input lanes). The 2x2
# space-to-depth tap re-binning that fixed the 3D stem (ops/fast_i3d.py:
# 11.8 -> 4.1 ms/256 frames) was tried here and measured SLOWER on v5e:
# 1.05 ms s2d vs 0.60 ms plain for the 256-frame 224² stem (round 5, isolated,
# honest device time) — XLA's 2D Cin=3 conv handling is already near its
# roofline and the input relayout costs more than the lanes buy. RECORDED
# NEGATIVE RESULT (like pallas_doubleconv): the exact transform + parity tests
# stay (stem_mode="s2d"), the production default is the plain stride-2 conv.
# The rest of the encoder runs inline (eval: folded BN; train: flax-exact batch
# stats) so both UNet++ fast paths are pure functions over the unchanged param
# tree. Reference semantics: smp UnetPlusPlus resnet18 encoder
# (model_loaders.py:18-30).


def stem2d_s2d_kernel(w: Array) -> Array:
    """(7,7,Cin,Cout) -> (4,4,4*Cin,Cout): exact tap re-binning for s2d input.

    Input channel blocks (qy, qx, c) match ``fast_i3d.space_to_depth_2x2``'s
    channel order; 2D analogue of ``fast_i3d.stem_s2d_kernel``."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7), w.shape
    ws = jnp.zeros((4, 4, 4, cin, cout), w.dtype)
    for jy in range(7):
        ay, qy = (jy - 3) // 2 + 2, (jy - 3) % 2
        for jx in range(7):
            ax, qx = (jx - 3) // 2 + 2, (jx - 3) % 2
            ws = ws.at[ay, ax, qy * 2 + qx, :, :].set(w[jy, jx])
    return ws.reshape(4, 4, 4 * cin, cout)


def _stem_conv(p_stem: dict, frames: Array, dtype, mode: str = "plain") -> Array:
    """The stride-2 7x7 stem conv. mode="plain" (production: measured faster on
    v5e) or "s2d" (space-to-depth tap re-binning — exact, kept as the recorded
    negative result + for parts where the trade may flip)."""
    if mode == "s2d":
        from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

        ws = stem2d_s2d_kernel(p_stem["conv"]["kernel"])
        xs = space_to_depth_2x2(frames.astype(dtype))
        return _conv_sp(xs, ws, (1, 1), [(2, 1), (2, 1)], dtype)
    return _conv_sp(frames, p_stem["conv"]["kernel"], (2, 2), [(3, 3), (3, 3)], dtype)


def _resnet_maxpool(x: Array) -> Array:
    """torchvision maxpool k3 s2 with symmetric pad=1 (models/resnet2d.py:92-97)."""
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=neg)
    # -inf init (not finfo.min): reverse-mode autodiff only recognizes the
    # max-pool pattern with the reducer's true identity element.
    return jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


# (layer name, num blocks, first-block stride) for the depth-4 r18 encoder.
_R18_ENC_LAYERS = (("layer1", 2, 1), ("layer2", 2, 2), ("layer3", 2, 2))


def _basic_block_eval(x: Array, p: dict, s: dict, stride: int, dtype) -> Array:
    """torchvision BasicBlock eval forward with folded BN (resnet2d.py:27-44)."""
    y = _conv_sp(x, p["conv1"]["conv"]["kernel"], (stride, stride), [(1, 1), (1, 1)], dtype)
    sc, bi = _bn_affine(p["conv1"]["bn"], s["conv1"]["bn"])
    y = jax.nn.relu(y * sc.astype(dtype) + bi.astype(dtype))
    y = _conv_sp(y, p["conv2"]["conv"]["kernel"], (1, 1), [(1, 1), (1, 1)], dtype)
    sc, bi = _bn_affine(p["conv2"]["bn"], s["conv2"]["bn"])
    y = y * sc.astype(dtype) + bi.astype(dtype)
    if "downsample" in p:
        # 1x1 stride-s SAME pads zero for every input size -> explicit (0,0).
        r = _conv_sp(x, p["downsample"]["conv"]["kernel"], (stride, stride), [(0, 0), (0, 0)], dtype)
        sc, bi = _bn_affine(p["downsample"]["bn"], s["downsample"]["bn"])
        r = r * sc.astype(dtype) + bi.astype(dtype)
    else:
        r = x
    return jax.nn.relu(y + r)


def fast_encoder_apply(
    p_enc: dict, s_enc: dict, frames: Array, dtype, stem_mode: str = "plain"
) -> list:
    """Eval forward of the r18 encoder (inline, folded BN). Returns the stage
    feature list [stem(/2,64), layer1(/4,64), layer2(/8,128), layer3(/16,256)]
    == ``ResNet2D.apply(...)[1:]`` (the input itself is never consumed by the
    UNet++ decoder)."""
    y = _stem_conv(p_enc["stem"], frames, dtype, stem_mode)
    sc, bi = _bn_affine(p_enc["stem"]["bn"], s_enc["stem"]["bn"])
    f1 = jax.nn.relu(y * sc.astype(dtype) + bi.astype(dtype))
    x = _resnet_maxpool(f1)
    feats = [f1]
    for lname, nblocks, stride in _R18_ENC_LAYERS:
        for i in range(nblocks):
            x = _basic_block_eval(
                x, p_enc[f"{lname}_{i}"], s_enc[f"{lname}_{i}"], stride if i == 0 else 1, dtype
            )
        feats.append(x)
    return feats


def _basic_block_train(x: Array, p: dict, s: dict, stride: int, dtype):
    """Train-mode BasicBlock (BN batch stats + running updates via _convbn_train)."""
    y = _conv_sp(x, p["conv1"]["conv"]["kernel"], (stride, stride), [(1, 1), (1, 1)], dtype)
    y, s1 = _convbn_train(y, p["conv1"], s["conv1"], dtype)
    y = _conv_sp(y, p["conv2"]["conv"]["kernel"], (1, 1), [(1, 1), (1, 1)], dtype)
    y, s2 = _convbn_train(y, p["conv2"], s["conv2"], dtype, relu=False)
    new = {"conv1": s1, "conv2": s2}
    if "downsample" in p:
        r = _conv_sp(x, p["downsample"]["conv"]["kernel"], (stride, stride), [(0, 0), (0, 0)], dtype)
        r, sd = _convbn_train(r, p["downsample"], s["downsample"], dtype, relu=False)
        new["downsample"] = sd
    else:
        r = x
    return jax.nn.relu(y + r), new


def fast_encoder_train_apply(
    p_enc: dict, s_enc: dict, frames: Array, dtype, stem_mode: str = "plain"
):
    """TRAIN forward of the r18 encoder: returns
    ``(stage feature list, updated encoder batch_stats subtree)`` matching
    ``ResNet2D.apply(..., train=True, mutable=["batch_stats"])``. Both stem
    modes are linear in the kernel, so gradients chain back to the original
    (7,7,3,64) weights exactly; BN statistics are flax-exact (_convbn_train)."""
    y = _stem_conv(p_enc["stem"], frames, dtype, stem_mode)
    f1, st_stem = _convbn_train(y, p_enc["stem"], s_enc["stem"], dtype)
    new: dict = {"stem": st_stem}
    x = _resnet_maxpool(f1)
    feats = [f1]
    for lname, nblocks, stride in _R18_ENC_LAYERS:
        for i in range(nblocks):
            x, bs = _basic_block_train(
                x, p_enc[f"{lname}_{i}"], s_enc[f"{lname}_{i}"], stride if i == 0 else 1, dtype
            )
            new[f"{lname}_{i}"] = bs
        feats.append(x)
    return feats, new


def encoder_layout_standard(p_enc: dict) -> bool:
    """True iff the encoder param tree is the reference r18 depth-4 layout the
    inline fast encoder is derived for (any other config falls back to the
    module rather than silently mis-slicing)."""
    try:
        return (
            tuple(p_enc["stem"]["conv"]["kernel"].shape) == (7, 7, 3, 64)
            and all(
                f"{ln}_{i}" in p_enc for ln, nb, _ in _R18_ENC_LAYERS for i in range(nb)
            )
            and "layer4_0" not in p_enc
        )
    except (KeyError, TypeError):
        return False


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


def _decoder_schedule(p: dict, f: list, dtype, block, conv=None) -> Array:
    """The UNet++ nested-skip decoder with multi-consumer skip convs batched along
    Cout so each runs with full MXU lanes: f[2] feeds x_1_1 + x_0_1, f[3] feeds
    x_2_2 + x_1_2 + x_0_2, and x_2_2 feeds x_1_2 + x_0_2. Channel slices follow the
    module's concat layout (conv1 input = [up(x), *skips], models/unet.py:114-121).

    ``block(name, xin, skip_sum)`` runs one decoder block given the precomputed
    conv1 skip contribution — eval and train paths plug in their BN flavor.
    ``conv(site, x, w)`` runs one skip conv (default: plain bf16 ``_conv``); the
    quantized path (ops/quant_unetpp.py) plugs in an int8 executor, with ``x``
    then being its (int8 data, scale) activation record. Skip conv OUTPUTS are
    always plain ``dtype`` tensors (the schedule slices and sums them).
    Returns x_0_3 (full-res, pre-head).
    """
    if conv is None:
        def conv(site, x, w):
            return _conv(x, w, dtype)

    def w1(name):
        return p[name]["conv1"]["conv"]["kernel"]

    x_0_0 = block("x_0_0", f[0], conv("sk_f1", f[1], w1("x_0_0")[:, :, 256:384, :]))
    f2c = conv(
        "sk_f2",
        f[2],
        jnp.concatenate([w1("x_1_1")[:, :, 128:192, :], w1("x_0_1")[:, :, 320:384, :]], axis=-1),
    )  # (.., 64+128)
    f3c = conv(
        "sk_f3",
        f[3],
        jnp.concatenate(
            [
                w1("x_2_2")[:, :, 64:128, :],
                w1("x_1_2")[:, :, 128:192, :],
                w1("x_0_2")[:, :, 256:320, :],
            ],
            axis=-1,
        ),
    )  # (.., 64*3)
    x_1_1 = block("x_1_1", f[1], f2c[..., :64])
    x_2_2 = block("x_2_2", f[2], f3c[..., :64])
    x22c = conv(
        "sk_x22",
        x_2_2,
        jnp.concatenate([w1("x_1_2")[:, :, 64:128, :], w1("x_0_2")[:, :, 192:256, :]], axis=-1),
    )  # (.., 64+64)
    x_0_1 = block(
        "x_0_1", x_0_0, conv("sk_x11", x_1_1, w1("x_0_1")[:, :, 256:320, :]) + f2c[..., 64:192]
    )
    x_1_2 = block("x_1_2", x_1_1, x22c[..., :64] + f3c[..., 64:128])
    x_0_2 = block(
        "x_0_2",
        x_0_1,
        conv("sk_x12", x_1_2, w1("x_0_2")[:, :, 128:192, :])
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


def _apply_head(p_head: dict, x_0_3: Array, in_h: int, in_w: int, dtype,
                emit_s2d: bool) -> Array:
    """Pad x_0_3 back to the input resolution and apply the segmentation head:
    plain 3x3 conv -> float32 output, or the stride-2 s2d-fused form
    (``head_s2d_kernel``) emitting the I3Res50 fast stem's (N,H/2,W/2,4*Cout)
    layout. Shared by the bf16 fused paths and the int8 quantized path
    (ops/quant_unetpp.py) — the head itself always runs in ``dtype``."""
    if x_0_3.shape[-3:-1] != (in_h, in_w):
        dh, dw = in_h - x_0_3.shape[-3], in_w - x_0_3.shape[-2]
        x_0_3 = jnp.pad(x_0_3, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    if emit_s2d:
        ws = head_s2d_kernel(p_head["kernel"])
        y = jax.lax.conv_general_dilated(
            x_0_3.astype(dtype), ws.astype(dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        return y + jnp.tile(p_head["bias"], 4).astype(dtype)
    out = _conv(x_0_3, p_head["kernel"], dtype) + p_head["bias"].astype(dtype)
    return out.astype(jnp.float32)


def fast_unetpp_apply(
    variables: dict, frames: Array, *, encoder_apply=None, dtype=jnp.bfloat16,
    emit_s2d: bool = False
) -> Array:
    """Fused eval forward of UNetPlusPlus (models/unet.py:100-130 semantics).

    ``variables``: the full UNetPlusPlus variable tree (params + batch_stats).
    ``encoder_apply``: None (default) = the inline fast encoder (s2d stem,
    ``fast_encoder_apply``; caller must have checked ``encoder_layout_standard``);
    else a callable (frames) -> module encoder feature list (incl. the input at
    index 0) for non-standard encoder configs.
    ``emit_s2d``: return (N, H/2, W/2, 12) space-to-depth output in ``dtype`` (for
    feeding the I3Res50 fast stem directly) instead of (N, H, W, 3) float32.
    """
    p, st = variables["params"], variables["batch_stats"]
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    if encoder_apply is None:
        feats = [None] + fast_encoder_apply(p["encoder"], st["encoder"], frames, dtype)
    else:
        feats = encoder_apply(frames)
    f = feats[1:][::-1]  # [/16(256), /8(128), /4(64), /2(64)]

    def blk(name, xin, skip_sum):
        return _up_block_parts(xin, skip_sum, p[name], st[name], dtype)

    x_0_3 = _decoder_schedule(p, f, dtype, blk)
    return _apply_head(p["head"], x_0_3, in_h, in_w, dtype, emit_s2d)


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


def fast_unetpp_train_apply(
    variables: dict, frames: Array, *, encoder_module=None, dtype=jnp.bfloat16
):
    """Fused TRAIN forward of UNetPlusPlus: same conv rewrites as the eval path
    (up2_conv folding, s2d encoder stem, batched multi-consumer skip convs) with
    flax-exact BN batch statistics. Returns ``(out, {"batch_stats": updated})``
    like ``module.apply(..., train=True, mutable=["batch_stats"])``.

    ``encoder_module``: None (default) = the inline fast encoder
    (``fast_encoder_train_apply``, s2d stem with exact gradient chaining); else a
    flax module applied for non-standard encoder configs.

    The rewrites are exact weight re-binnings, so conv outputs — and therefore the
    BN statistics computed from them — match the module to float tolerance, and
    gradients flow through the (linear) kernel transforms to the original params.
    """
    from jax.ad_checkpoint import checkpoint_name

    p, st = variables["params"], variables["batch_stats"]
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    if encoder_module is None:
        enc_feats, enc_new = fast_encoder_train_apply(
            p["encoder"], st["encoder"], frames, dtype
        )
        new_stats: dict = {"encoder": enc_new}
        feats = [None] + enc_feats
    else:
        enc_vars = {"params": p["encoder"], "batch_stats": st["encoder"]}
        feats, enc_mut = encoder_module.apply(
            enc_vars, frames, train=True, mutable=["batch_stats"]
        )
        new_stats = {"encoder": enc_mut["batch_stats"]}
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
    out = _apply_head(p["head"], x_0_3, in_h, in_w, dtype, emit_s2d=False)
    return out, {"batch_stats": new_stats}


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
    # Standard r18 layout -> inline fast encoder (s2d stem); anything else runs
    # the module encoder inside the otherwise-fused decoder.
    inline_enc = encoder_layout_standard(fa_vars["params"].get("encoder", {}))

    def encoder_apply_from(variables):
        if inline_enc:
            return None
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
                    variables, frames,
                    encoder_module=None if inline_enc else enc, dtype=dtype,
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
