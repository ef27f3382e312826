"""Batched on-device augmentation — the DALI/torchvision-CPU replacement.

The reference augments per-frame on CPU workers with PIL/torchvision
(aux_code/ucf101_dl.py:149-195 strong/weak train augs, :297-320 val augs; vispr_dl.py
image augs). Here the *randomness* is sampled on host (numpy, same distributions —
ucf101_dl.py:95-122) into an :class:`AugmentParams` batch, and the *pixel work* runs on
device as one jitted function over the whole batch: crop+resize via
``jax.image.scale_and_translate`` (antialiased, per-sample affine), color ops as fused
elementwise math. XLA fuses the chain into a few kernels next to the model — this is the
"fused preprocessing" path of SURVEY.md §7 step 3.

Divergences from torchvision (documented, metric-level parity target):
  - ops run in float32 [0,1] without uint8 re-quantization between steps;
  - the reference flips RGB->BGR before augmenting (ucf101_dl.py:126
    ``torch.flip(frame.permute(2,0,1), dims=[0])``); we stay RGB end-to-end (consistent
    through train/eval/extraction, so learned behavior is equivalent).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side parameter sampling (numpy RNG, worker processes / threads)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AugmentParams:
    """Per-clip augmentation parameters; arrays of shape (B, ...). Field semantics and
    distributions follow ucf101_dl.py:95-122."""

    # Crop box in source pixels: top-left (y0, x0) and size (crop_h, crop_w).
    y0: np.ndarray
    x0: np.ndarray
    crop_h: np.ndarray
    crop_w: np.ndarray
    # Color jitter gates (bool) and factors.
    do_contrast: np.ndarray
    contrast: np.ndarray
    do_hue: np.ndarray
    hue: np.ndarray
    do_saturation: np.ndarray
    saturation: np.ndarray
    do_brightness: np.ndarray
    brightness: np.ndarray
    do_grayscale: np.ndarray
    do_gamma: np.ndarray
    gamma: np.ndarray
    do_hflip: np.ndarray
    # Two random-erase boxes in output pixels: (B, 2) each.
    do_erase: np.ndarray
    erase_y: np.ndarray
    erase_x: np.ndarray
    erase_h: np.ndarray
    erase_w: np.ndarray

    def to_device(self) -> dict[str, Array]:
        return {f.name: jnp.asarray(getattr(self, f.name)) for f in dataclasses.fields(self)}


def sample_augment_params(
    rng: np.random.Generator,
    batch: int,
    src_h: int,
    src_w: int,
    out_h: int = 224,
    out_w: int = 224,
    min_crop: float = 0.6,
    no_ar_distortion: bool = False,
    aspect_ratio_aug: bool = False,
    weak: bool = False,
) -> AugmentParams:
    """Sample the reference's per-clip augmentation draw (ucf101_dl.py:95-122).

    ``weak`` = crop+resize only (weak_augmentation, :185-195; anonymizer training uses it,
    params_anonymization.py weak_aug=True).
    """
    min_size = min(src_h, src_w)
    cf = rng.uniform(min_crop, 1.0, size=(batch, 2))
    if no_ar_distortion:
        crop_h = (min_size * cf[:, 0]).astype(np.int32)
        crop_w = crop_h.copy()
    else:
        crop_h = (src_h * cf[:, 0]).astype(np.int32)
        crop_w = (src_w * cf[:, 0]).astype(np.int32)
    x0 = (rng.random(batch) * (src_w - crop_w + 1)).astype(np.int32)
    # aspect_ratio_aug widens only the y0 SAMPLING range via cf[1]; the crop size stays
    # cf[0] (ucf101_dl.py:104-107 vs :157) — the box may hang past the bottom edge, which
    # the affine resample zero-pads exactly like torchvision's out-of-bounds crop.
    y_range_crop = (src_h * cf[:, 1]).astype(np.int32) if aspect_ratio_aug and not no_ar_distortion else crop_h
    y0 = (rng.random(batch) * np.maximum(src_h - y_range_crop + 1, 1)).astype(np.int32)

    r = rng.random((batch, 10))
    off = np.zeros(batch, bool)
    params = AugmentParams(
        y0=y0,
        x0=x0,
        crop_h=crop_h,
        crop_w=crop_w,
        # contrast fires in two disjoint windows totalling p=0.125 (ucf101_dl.py:160-168).
        do_contrast=off if weak else (r[:, 0] < 0.125),
        contrast=rng.uniform(0.9, 1.1, batch),
        do_hue=off if weak else (r[:, 1] < 0.15),
        hue=rng.uniform(-0.05, 0.05, batch),
        do_saturation=off if weak else (r[:, 2] < 0.15),
        saturation=rng.uniform(0.9, 1.1, batch),
        do_brightness=off if weak else (r[:, 3] < 0.15),
        brightness=rng.uniform(0.9, 1.1, batch),
        do_grayscale=off if weak else (r[:, 4] > 0.9),
        do_gamma=off if weak else ((r[:, 4] > 0.9) & (r[:, 5] > 0.25)),
        gamma=rng.uniform(0.85, 1.15, batch),
        do_hflip=off if weak else (r[:, 6] > 0.5),
        do_erase=np.zeros((batch, 2), bool) if weak else (r[:, 7:9] < 0.4),
        erase_y=rng.integers(0, out_w, size=(batch, 2)).astype(np.int32),  # ref passes x as row
        erase_x=rng.integers(0, out_h, size=(batch, 2)).astype(np.int32),
        erase_h=rng.integers(
            max(int((src_h / 6) * (out_h / 224)), 1), max(int((src_h / 3) * (out_h / 224)), 2), size=(batch, 2)
        ).astype(np.int32),
        erase_w=rng.integers(
            max(int((src_w / 6) * (out_h / 224)), 1), max(int((src_w / 3) * (out_h / 224)), 2), size=(batch, 2)
        ).astype(np.int32),
    )
    return params


# ---------------------------------------------------------------------------
# Device-side ops (jit-safe; static output shapes)
# ---------------------------------------------------------------------------


def crop_resize_one(frames: Array, y0, x0, crop_h, crop_w, out_h: int, out_w: int) -> Array:
    """Antialiased crop+resize of one clip (T, H, W, C) via scale_and_translate.

    Equivalent to torchvision ``resized_crop(..., antialias=True)`` with bilinear kernel:
    output pixel grid maps affinely onto the crop box. Divergence: torchvision crops
    before resizing, so its edge taps clamp at the crop border; this one-pass affine
    resample's antialias taps extend a pixel past the crop into the source image —
    interior pixels match exactly, the border row/col differs slightly (immaterial for
    random-crop training views; the deterministic eval path crops explicitly).
    """
    scale_y = out_h / crop_h.astype(jnp.float32)
    scale_x = out_w / crop_w.astype(jnp.float32)
    # scale_and_translate: out(y) = in(y/scale - translate/scale) with translate in output
    # units: source y0 maps to output 0 -> translation = -y0 * scale.
    translation = jnp.stack([-y0.astype(jnp.float32) * scale_y, -x0.astype(jnp.float32) * scale_x])
    return jax.image.scale_and_translate(
        frames.astype(jnp.float32),
        (frames.shape[0], out_h, out_w, frames.shape[3]),
        spatial_dims=(1, 2),
        scale=jnp.stack([scale_y, scale_x]),
        translation=translation,
        method="linear",
        antialias=True,
    )


_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # torchvision L mode / rgb_to_grayscale


def _blend(img: Array, other: Array, factor: Array) -> Array:
    return factor * img + (1.0 - factor) * other


def adjust_contrast(img: Array, factor: Array) -> Array:
    mean = jnp.mean(img @ _GRAY_W, axis=(-2, -1), keepdims=True)[..., None]
    return _blend(img, mean, factor)


def adjust_saturation(img: Array, factor: Array) -> Array:
    gray = (img @ _GRAY_W)[..., None]
    return _blend(img, gray, factor)


def adjust_brightness(img: Array, factor: Array) -> Array:
    return img * factor


def adjust_gamma(img: Array, gamma: Array, gain: float = 1.0) -> Array:
    return gain * jnp.power(jnp.clip(img, 1e-8, 1.0), gamma)


def rgb_to_hsv(img: Array) -> tuple[Array, Array, Array]:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    dz = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # lax.select_n, NOT jnp.choose: choose lowers to per-element gathers, which ran at
    # ~0.1 TF/s on v5e (332 ms for a B=8 16-frame batch — measured); select_n is a pure
    # elementwise VPU select chain (same batch: <1 ms).
    i = jnp.clip(i.astype(jnp.int32) % 6, 0, 5)
    r = jax.lax.select_n(i, v, q, p, p, t, v)
    g = jax.lax.select_n(i, t, v, v, q, p, p)
    b = jax.lax.select_n(i, p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img: Array, hue_shift: Array) -> Array:
    h, s, v = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    return hsv_to_rgb((h + hue_shift) % 1.0, s, v)


def to_grayscale(img: Array) -> Array:
    gray = img @ _GRAY_W
    return jnp.repeat(gray[..., None], 3, axis=-1)


def erase_box(img: Array, y: Array, x: Array, h: Array, w: Array) -> Array:
    """Zero a box (torchvision ``erase`` with v=0); OOB clipped like python slicing."""
    hh = jnp.arange(img.shape[-3])[:, None]
    ww = jnp.arange(img.shape[-2])[None, :]
    inside = (hh >= y) & (hh < y + h) & (ww >= x) & (ww < x + w)
    return jnp.where(inside[..., None], 0.0, img)


def _gate(flag, fn, img, *args):
    return jnp.where(flag, fn(img, *args), img)


def augment_clip(frames: Array, p: dict[str, Array], out_h: int, out_w: int) -> Array:
    """One clip (T, H, W, C) uint8/float in [0,255] -> augmented (T, out_h, out_w, C) f32
    in [0,1]. Order matches ucf101_dl.py:149-182 (color ops pre-/255 there act on PIL
    uint8; scale-equivariant so applied post-normalize here; gamma is on [0,1] either way).
    """
    img = frames.astype(jnp.float32) / 255.0
    img = crop_resize_one(img, p["y0"], p["x0"], p["crop_h"], p["crop_w"], out_h, out_w)
    img = _gate(p["do_contrast"], adjust_contrast, img, p["contrast"])
    img = _gate(p["do_hue"], adjust_hue, img, p["hue"])
    img = _gate(p["do_saturation"], adjust_saturation, img, p["saturation"])
    img = _gate(p["do_brightness"], adjust_brightness, img, p["brightness"])
    img = _gate(p["do_grayscale"], lambda x: to_grayscale(x), img)
    img = _gate(p["do_gamma"], adjust_gamma, img, p["gamma"])
    img = jnp.where(p["do_hflip"], img[:, :, ::-1, :], img)
    img = jnp.clip(img, 0.0, 1.0)
    for k in range(2):
        erased = erase_box(img, p["erase_y"][k], p["erase_x"][k], p["erase_h"][k], p["erase_w"][k])
        img = jnp.where(p["do_erase"][k], erased, img)
    return img


def augment_batch(frames: Array, params: dict[str, Array], out_h: int = 224, out_w: int = 224) -> Array:
    """(B, T, H, W, C) + AugmentParams.to_device() -> (B, T, out_h, out_w, C) f32 [0,1].
    vmapped over clips; jit at the call site fuses everything.

    Frame-wise mode (ucf101_dl.py:127-135 framewise_aug): when the params' leading dim is
    ``B*T`` instead of ``B``, every frame gets its own draw — frames are treated as
    length-1 clips."""
    b, t = frames.shape[0], frames.shape[1]
    n_params = params["y0"].shape[0]
    if n_params == b * t and t != 1:
        flat = frames.reshape((b * t, 1) + frames.shape[2:])
        out = jax.vmap(lambda f, p: augment_clip(f, p, out_h, out_w))(flat, params)
        return out.reshape((b, t) + out.shape[2:])
    return jax.vmap(lambda f, p: augment_clip(f, p, out_h, out_w))(frames, params)


def expand_framewise(
    params: AugmentParams, num_frames: int, rng: np.random.Generator, erase_size: int = 19
) -> AugmentParams:
    """Per-clip draw -> per-frame draw (ucf101_dl.py:125-135): the random GATES stay fixed
    per clip (random_array is sampled once outside the frame loop), while the color
    FACTORS and the erase sizes (randint(erase_size/2, erase_size)) resample per frame;
    crop box and erase positions tile across frames."""
    b = params.y0.shape[0]
    tiled = {}
    for f in dataclasses.fields(params):
        arr = getattr(params, f.name)
        tiled[f.name] = np.repeat(arr, num_frames, axis=0)
    out = AugmentParams(**tiled)
    n = b * num_frames
    out.contrast = rng.uniform(0.9, 1.1, n)
    out.hue = rng.uniform(-0.05, 0.05, n)
    out.saturation = rng.uniform(0.9, 1.1, n)
    out.brightness = rng.uniform(0.9, 1.1, n)
    out.gamma = rng.uniform(0.85, 1.15, n)
    out.erase_h = rng.integers(erase_size // 2, erase_size, size=(n, 2)).astype(np.int32)
    out.erase_w = rng.integers(erase_size // 2, erase_size, size=(n, 2)).astype(np.int32)
    return out


def center_crop_resize(
    frames: Array, cropping_factor: float, out_h: int, out_w: int, hflip: bool = False,
    no_ar_distortion: bool = False,
) -> Array:
    """Validation transform (ucf101_dl.py:297-320; dali_extraction.py:38-50): center crop
    by factor, resize, optional hflip. Static params -> plain jit-safe ops."""
    t, h, w, c = frames.shape[-4:]
    img = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:  # float inputs are assumed already in [0, 1]
        img = img / 255.0
    if cropping_factor <= 1:
        if no_ar_distortion:
            ch = cw = int(min(h, w) * cropping_factor)
        else:
            ch, cw = int(h * cropping_factor), int(w * cropping_factor)
        # torchvision center_crop: crop_top = int(round((h-ch)/2.0)) with python
        # round-half-to-EVEN — (d//2)+(d%2) would shift one pixel when d % 4 == 1.
        y0, x0 = int(round((h - ch) / 2.0)), int(round((w - cw) / 2.0))
        img = img[..., y0 : y0 + ch, x0 : x0 + cw, :]
    img = jax.image.resize(img, (*img.shape[:-3], out_h, out_w, c), method="linear", antialias=True)
    if hflip:
        img = img[..., :, ::-1, :]
    return img


def multi_crop_resize(
    frames: Array, cropping_factor: float, out_h: int, out_w: int, ncrops: int
) -> Array:
    """TTA crop fan-out for multi-crop feature extraction (torchvision five_crop /
    ten_crop order: tl, tr, bl, br, center [+ the same five hflipped]): windows of
    ``cropping_factor`` at the four corners and the center (center geometry identical
    to :func:`center_crop_resize`), each resized to (out_h, out_w).

    ``(..., T, H, W, C) -> (..., ncrops, T, out_h, out_w, C)`` — the crop axis is
    inserted before time so per-clip features stack to the published MGFN datasets'
    (T, ncrops, F) layout. ``ncrops`` in (5, 10). The reference cannot produce these
    (dali_extraction.py:38-50 is center-crop only); the upstream MGFN feature releases
    are 10-crop."""
    if ncrops not in (5, 10):
        raise ValueError(f"ncrops must be 5 or 10, got {ncrops}")
    t, h, w, c = frames.shape[-4:]
    img = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:  # float inputs are assumed already in [0, 1]
        img = img / 255.0
    ch, cw = int(h * cropping_factor), int(w * cropping_factor)
    y0c, x0c = int(round((h - ch) / 2.0)), int(round((w - cw) / 2.0))
    views = []
    for y0, x0 in ((0, 0), (0, w - cw), (h - ch, 0), (h - ch, w - cw), (y0c, x0c)):
        v = img[..., y0 : y0 + ch, x0 : x0 + cw, :]
        views.append(
            jax.image.resize(v, (*v.shape[:-3], out_h, out_w, c), method="linear", antialias=True)
        )
    out = jnp.stack(views, axis=-5)
    if ncrops == 10:
        # torchvision ten_crop order: five_crop(img) + five_crop(hflip(img)).
        # Cropping the FLIPPED image at (tl, tr, bl, br, center) equals mirroring
        # the (tr, tl, br, bl, center) views of the original — the symmetric resize
        # kernel commutes with the mirror — so reorder before flipping; a plain
        # per-view flip would swap crop indices 5<->6 and 7<->8 vs torchvision.
        flipped = jnp.take(out, jnp.asarray([1, 0, 3, 2, 4]), axis=-5)[..., :, ::-1, :]
        out = jnp.concatenate([out, flipped], axis=-5)
    return out


def five_crop_corners(frames: Array, crop_h: int, crop_w: int) -> tuple[Array, Array]:
    """threeCrop TTA extra views: torchvision five_crop returns (tl, tr, bl, br, center),
    so the reference's crops [0] and [-2] (ucf101_dl.py:303-308) are top-left and
    BOTTOM-RIGHT."""
    tl = frames[..., :crop_h, :crop_w, :]
    br = frames[..., -crop_h:, -crop_w:, :]
    return tl, br
