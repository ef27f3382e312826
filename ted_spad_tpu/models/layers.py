"""Shared flax building blocks for the TeD-SPAD TPU model zoo.

Layout convention is TPU-native channels-last: images ``(B, H, W, C)``, videos
``(B, T, H, W, C)``. The reference is NCHW/NCTHW torch (aux_code/models/*); layouts here are
chosen so XLA tiles convs straight onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Torch BatchNorm defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def kaiming_normal_fan_out():
    """torch ``nn.init.kaiming_normal_(mode='fan_out')`` (large_i3d.py:157-162)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class ConvBN(nn.Module):
    """conv -> BN -> optional ReLU with torch-style semantics, any spatial rank.

    ``train`` drives BN batch-stat updates; ``frozen_bn=True`` reproduces the reference's
    FrozenBN (large_i3d.py:8-39): running stats are *used and never updated* even in train
    mode (applied to largei3d during fine-tune, train_action.py:39-41).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = False
    use_bn: bool = True
    act: bool = True
    bn_eps: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides) if self.strides else None,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=(not train) or frozen_bn,
                momentum=BN_MOMENTUM,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


def tf_same_pads(size: int, kernel: int, stride: int) -> tuple[int, int]:
    """TF-style dynamic SAME padding for one dim (i3d.py:15-19, 89-111).

    Shapes are static under jit, so this runs at trace time. Matches the reference's
    front/back split: ``pad//2`` front, remainder back.
    """
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - (size % stride), 0)
    return (pad // 2, pad - pad // 2)


def max_pool_same(x: Array, window: Sequence[int], strides: Sequence[int]) -> Array:
    """MaxPool3dSamePadding (i3d.py:13-45): TF-SAME pad (with -inf) then VALID max pool.

    ``window``/``strides`` cover the spatial dims of ``(B, *spatial, C)``.
    """
    pads = [(0, 0)]
    for dim, (k, s) in enumerate(zip(window, strides)):
        pads.append(tf_same_pads(x.shape[1 + dim], k, s))
    pads.append((0, 0))
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    x = jnp.pad(x, pads, constant_values=neg)
    return nn.max_pool(x, tuple(window), strides=tuple(strides), padding="VALID")


def max_pool_valid(x: Array, window: Sequence[int], strides: Sequence[int]) -> Array:
    """torch MaxPool with padding=0 (floor mode) == VALID pooling."""
    return nn.max_pool(x, tuple(window), strides=tuple(strides), padding="VALID")


def global_avg_pool(x: Array) -> Array:
    """AdaptiveAvgPool to (1,..,1) then flatten: mean over all spatial dims -> (B, C)."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x.astype(jnp.float32), axis=axes)


def resize_bilinear(x: Array, scale: int = 2) -> Array:
    """Bilinear 2x upsample, align_corners=True (unet_parts.py:53).

    jax.image.resize has no align_corners mode; implement via explicit gather weights.
    Spatial dims are axes (-3, -2) of ``(..., H, W, C)``.
    """
    h, w = x.shape[-3], x.shape[-2]
    return _resize_align_corners(x, h * scale, w * scale)


def _axis_weights(in_size: int, out_size: int):
    if in_size == 1:
        idx0 = jnp.zeros(out_size, jnp.int32)
        return idx0, idx0, jnp.zeros(out_size, jnp.float32)
    # align_corners=True: src = i * (in-1)/(out-1)
    src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    frac = src - i0.astype(jnp.float32)
    return i0, i1, frac


def _resize_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    h0, h1, hf = _axis_weights(x.shape[-3], out_h)
    w0, w1, wf = _axis_weights(x.shape[-2], out_w)
    hf = hf[:, None, None]
    top = jnp.take(xf, h0, axis=-3)
    bot = jnp.take(xf, h1, axis=-3)
    xf = top * (1 - hf) + bot * hf
    wf = wf[:, None]
    left = jnp.take(xf, w0, axis=-2)
    right = jnp.take(xf, w1, axis=-2)
    xf = left * (1 - wf) + right * wf
    return xf.astype(orig_dtype)


def resize_nearest(x: Array, scale: int = 2) -> Array:
    """Nearest-neighbor 2x upsample (smp UnetPlusPlus DecoderBlock interpolate mode)."""
    x = jnp.repeat(x, scale, axis=-3)
    return jnp.repeat(x, scale, axis=-2)


def pad_to_match(x: Array, target_h: int, target_w: int) -> Array:
    """Pad spatial dims centered, torch ``F.pad([dx//2, dx-dx//2, ...])`` (unet_parts.py:56-63)."""
    dh = target_h - x.shape[-3]
    dw = target_w - x.shape[-2]
    pads = [(0, 0)] * (x.ndim - 3) + [(dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)]
    return jnp.pad(x, pads)
