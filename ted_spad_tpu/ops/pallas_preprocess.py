"""Pallas TPU kernel: fused uint8 -> crop -> antialiased bilinear resize -> normalize.

The feature-extraction preprocessing (dali_extraction.py:38-50: /255, center-crop 0.8,
resize 224) expressed as TWO MXU MATMULS per image plane instead of gather-based
resampling: separable bilinear (optionally antialiased) resize is ``R_y @ img @ R_x^T``
where the resize matrices bake in (a) the crop window, (b) the 1/255 normalization, and
(c) the triangle filter — so the kernel reads raw uint8 straight from the decoder and
emits normalized bf16/f32 at target resolution in one VMEM round trip.

Grid: one program per (clip*frame, channel) plane; planes are (H_src, W_src) uint8 blocks
(240x320 ~ 75KB) and both matmuls run on the MXU with f32 accumulation. On CPU the same
kernel runs under ``interpret=True`` (tests compare against ops.augment.center_crop_resize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resize_matrix(
    src: int,
    dst: int,
    crop_start: int = 0,
    crop_size: int | None = None,
    antialias: bool = True,
    scale_gain: float = 1.0,
) -> np.ndarray:
    """(dst, src) row-stochastic resample matrix: crop [crop_start, crop_start+crop_size)
    then resize to ``dst`` with the align_corners=False convention (matches
    jax.image.resize / torchvision antialias semantics). ``scale_gain`` folds constants
    (e.g. 1/255) into the matrix."""
    crop_size = crop_size if crop_size is not None else src
    scale = crop_size / dst
    support = max(scale, 1.0) if antialias else 1.0
    out = np.zeros((dst, src), np.float32)
    for o in range(dst):
        center = crop_start + (o + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        idx = np.arange(lo, hi + 1)
        w = 1.0 - np.abs(idx - center) / support
        w = np.clip(w, 0.0, None)
        # Edge handling: renormalize over taps INSIDE the crop window — resizing the
        # cropped array never sees pixels beyond the crop (matches crop-then-resize).
        valid = (idx >= crop_start) & (idx < crop_start + crop_size) & (idx >= 0) & (idx < src)
        w = w * valid
        s = w.sum()
        if s <= 0:
            nearest = int(np.clip(round(center), 0, src - 1))
            out[o, nearest] = 1.0
            continue
        out[o, idx[valid]] = w[valid] / s
    return out * scale_gain


def _preprocess_kernel(img_ref, ry_ref, rxt_ref, out_ref):
    # Mosaic has no direct u8->f32 cast; hop through int32 (free on the VPU).
    img = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H_src, W_src) plane
    tmp = jnp.dot(ry_ref[:], img, preferred_element_type=jnp.float32)  # (H_dst, W_src)
    out = jnp.dot(tmp, rxt_ref[:], preferred_element_type=jnp.float32)  # (H_dst, W_dst)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "cropping_factor", "out_dtype", "interpret")
)
def fused_preprocess(
    clips_u8: jax.Array,
    *,
    out_h: int = 224,
    out_w: int = 224,
    cropping_factor: float = 0.8,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """(B, T, H, W, 3) uint8 -> (B, T, out_h, out_w, 3) normalized [0,1] ``out_dtype``.

    Equivalent to ``center_crop_resize(clips/255, cropping_factor, out_h, out_w)``
    (val transform, dali_extraction.py:38-50) as a single Pallas program."""
    b, t, h, w, c = clips_u8.shape
    if cropping_factor <= 1:
        ch, cw = int(h * cropping_factor), int(w * cropping_factor)
    else:  # >1 means no crop (ucf101_dl.py:300; matches center_crop_resize)
        ch, cw = h, w
    # torchvision center_crop rounding: round-half-to-even.
    y0 = int(round((h - ch) / 2.0))
    x0 = int(round((w - cw) / 2.0))
    ry = jnp.asarray(resize_matrix(h, out_h, y0, ch, scale_gain=1.0 / 255.0))
    rxt = jnp.asarray(resize_matrix(w, out_w, x0, cw)).T  # (W_src, W_dst)

    # Planar view: (B*T*3, H, W) so each grid step is one clean 2D plane.
    planes = clips_u8.reshape(b * t, h, w, c).transpose(0, 3, 1, 2).reshape(b * t * c, h, w)
    n = planes.shape[0]

    out = pl.pallas_call(
        _preprocess_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), out_dtype),
        interpret=interpret,
    )(planes, ry, rxt)
    return out.reshape(b * t, c, out_h, out_w).transpose(0, 2, 3, 1).reshape(b, t, out_h, out_w, c)
