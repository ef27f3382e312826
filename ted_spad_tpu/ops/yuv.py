"""Device-side YUV420 ingest: fused crop + resize + chroma upsample + YCbCr -> RGB.

The planar decode mode (native/videodec vd_read_strided_yuv) ships 1.5 bytes/px to the
device instead of RGB24's 3 and skips the host-side swscale color conversion — the
host's job shrinks to entropy decode + plane memcpy, and the color math rides the MXU.

Equivalence: color conversion is affine in (Y,U,V) and the separable resize operators
are row-stochastic over the crop window, so ``resize(color(yuv)) == color(resize(yuv))``
exactly — we resize the three planes (chroma straight from half resolution to the
target grid, which also absorbs the 2x chroma upsample) and then apply the affine
color matrix. Matches the reference val transform semantics (/255, center-crop 0.8,
resize 224 — dali_extraction.py:38-50) within swscale's fixed-point tolerance.

Colorspace: BT.601 by default (swscale's untagged assumption, matching the RGB decode
path). BT.709-tagged sources pass a per-clip ``bt709`` row flag — the coefficient set
becomes a per-row select, so one compiled program handles batches that mix 601- and
709-tagged videos (extraction packs clips from many videos per batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ted_spad_tpu.ops.pallas_preprocess import resize_matrix

Array = jax.Array

# YCbCr -> RGB affine coefficients. Limited (studio) range is the untagged default
# swscale assumes (videodec.cpp vd_full_range); full range is the yuvj/pc case.
_BT601_LIMITED = dict(ky=1.164383, y_off=16.0, rv=1.596027, gu=-0.391762, gv=-0.812968, bu=2.017232)
_BT601_FULL = dict(ky=1.0, y_off=0.0, rv=1.402, gu=-0.344136, gv=-0.714136, bu=1.772)
_BT709_LIMITED = dict(ky=1.164383, y_off=16.0, rv=1.792741, gu=-0.213249, gv=-0.532909, bu=2.112402)
_BT709_FULL = dict(ky=1.0, y_off=0.0, rv=1.5748, gu=-0.187324, gv=-0.468124, bu=1.8556)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "cropping_factor", "out_dtype", "full_range")
)
def fused_preprocess_yuv(
    y_u8: Array,
    u_u8: Array,
    v_u8: Array,
    *,
    out_h: int = 224,
    out_w: int = 224,
    cropping_factor: float = 0.8,
    out_dtype: jnp.dtype = jnp.bfloat16,
    full_range: bool = False,
    bt709: Array | None = None,
    full: Array | None = None,
) -> Array:
    """(B,T,H,W) + 2x(B,T,H/2,W/2) uint8 planes -> (B,T,out_h,out_w,3) [0,1] RGB.

    Requires the full-res crop window to be chroma-aligned (even offsets/sizes —
    true for the 240x320 @ 0.8 extraction config); callers fall back to the RGB
    path otherwise.

    ``bt709`` / ``full``: optional (B,) bool/0-1 row flags — rows marked in
    ``bt709`` convert with the BT.709 matrix instead of BT.601, rows marked in
    ``full`` use the full-range (yuvj/pc) transfer instead of limited/studio
    (per-row affine-coefficient selects; the plane resampling is
    colorspace-independent). None = BT.601 / the static ``full_range`` flag.
    """
    h, w = y_u8.shape[-2], y_u8.shape[-1]
    if cropping_factor <= 1:
        ch, cw = int(h * cropping_factor), int(w * cropping_factor)
    else:
        ch, cw = h, w
    y0 = int(round((h - ch) / 2.0))
    x0 = int(round((w - cw) / 2.0))
    if y0 % 2 or x0 % 2 or ch % 2 or cw % 2 or h % 2 or w % 2:
        raise ValueError(f"chroma-misaligned crop ({y0},{x0},{ch},{cw}) — use the RGB path")

    ry = jnp.asarray(resize_matrix(h, out_h, y0, ch))
    rxt = jnp.asarray(resize_matrix(w, out_w, x0, cw)).T
    cry = jnp.asarray(resize_matrix(h // 2, out_h, y0 // 2, ch // 2))
    crxt = jnp.asarray(resize_matrix(w // 2, out_w, x0 // 2, cw // 2)).T

    def resample(p, a, bt):
        return jnp.einsum("oh,...hw,wx->...ox", a, p.astype(jnp.float32), bt)

    yf = resample(y_u8, ry, rxt)
    uf = resample(u_u8, cry, crxt) - 128.0
    vf = resample(v_u8, cry, crxt) - 128.0

    if bt709 is None and full is None:
        c = _BT601_FULL if full_range else _BT601_LIMITED
    else:
        # Per-row coefficient select over the 4 (matrix x range) sets: a (B,) index
        # gathers each scalar coefficient, broadcast over (B,T,out_h,out_w).
        b = (bt709 if bt709 is not None else full).shape[0]
        sel709 = (
            bt709.astype(jnp.int32) if bt709 is not None else jnp.zeros((b,), jnp.int32)
        )
        if full is not None:
            selfull = full.astype(jnp.int32)
        else:
            selfull = jnp.full((b,), int(full_range), jnp.int32)
        idx = sel709 + 2 * selfull  # 0: 601L, 1: 709L, 2: 601F, 3: 709F
        sets = (_BT601_LIMITED, _BT709_LIMITED, _BT601_FULL, _BT709_FULL)
        shape = (b,) + (1,) * (yf.ndim - 1)
        c = {
            k: jnp.take(jnp.asarray([s[k] for s in sets], jnp.float32), idx).reshape(shape)
            for k in _BT601_LIMITED
        }
    yy = c["ky"] * (yf - c["y_off"])
    r = yy + c["rv"] * vf
    g = yy + c["gu"] * uf + c["gv"] * vf
    b = yy + c["bu"] * uf
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return jnp.clip(rgb, 0.0, 1.0).astype(out_dtype)
