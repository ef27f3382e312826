"""Anonymization visualization: run fa over whole videos and write before/after artifacts.

Reference: visualization/visualize_anonymization.py (anonymize_videos:65 — decord full
read, per-frame fa, imageio mp4 write :84-115; before/after sample PNGs shipped in-repo).

TPU redesign: frames stream through the native decoder in fixed-size chunks, fa runs as
one jitted batched program per chunk, and outputs are written as .mp4 via the native
libavformat encoder (imageio-parity artifact, visualize_anonymization.py:84-115), falling
back to Y4M (pure-python encoder) if the native layer is unavailable; plus PNG
side-by-side grids via PIL.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.data.video_reader import native_available, open_video, write_mp4, write_y4m
from ted_spad_tpu.models import load_fa_model


def make_anonymize_fn(fa_model, fa_vars) -> Callable:
    from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

    fast_fa = make_fast_fa_apply(fa_model, fa_vars)

    @jax.jit
    def anonymize(frames_u8):
        img = frames_u8.astype(jnp.float32) / 255.0
        out = fast_fa(fa_vars, img, train=False)
        return jnp.clip(out, 0.0, 1.0)

    return anonymize


def anonymize_video(
    video_uri: str,
    out_dir: str,
    *,
    fa_variables=None,
    saved_model_fa: str | None = None,
    arch_fa: str = "unet++",
    chunk: int = 32,
    size: tuple[int, int] = (240, 320),
    sample_grid_frames: int = 4,
    dtype: str = "float32",
) -> dict[str, str]:
    """Write ``<name>_anon.mp4`` (Y4M fallback) + ``<name>_grid.png``
    (original|anonymized rows)."""
    os.makedirs(out_dir, exist_ok=True)
    h, w = size
    fa_model, fa_vars = load_fa_model(saved_model_fa, arch=arch_fa, image_size=(h, w), dtype=dtype)
    if fa_variables is not None:
        fa_vars = fa_variables
    anonymize = make_anonymize_fn(fa_model, fa_vars)

    vr = open_video(video_uri, w, h)
    n = len(vr)
    anon_frames = []
    orig_frames = []
    for start in range(0, n, chunk):
        count = min(chunk, n - start)
        frames = vr.read_strided(start, count, 1)
        out = np.asarray(anonymize(jnp.asarray(frames)))
        anon_frames.append((out * 255.0 + 0.5).astype(np.uint8))
        orig_frames.append(frames)
    vr.close()
    anon = np.concatenate(anon_frames)
    orig = np.concatenate(orig_frames)

    base = os.path.basename(video_uri).rsplit(".", 1)[0].replace("synthetic://", "synth_").replace(
        ",", "_"
    ).replace("=", "")
    fps = vr.fps if getattr(vr, "fps", 0) else 25.0
    if native_available():
        video_path = os.path.join(out_dir, f"{base}_anon.mp4")
        write_mp4(video_path, anon, fps=fps)
    else:
        video_path = os.path.join(out_dir, f"{base}_anon.y4m")
        write_y4m(video_path, anon, fps=int(round(fps)))

    # Side-by-side sample grid (original top row, anonymized bottom row).
    from PIL import Image

    idx = np.linspace(0, len(anon) - 1, sample_grid_frames).astype(int)
    top = np.concatenate([orig[i] for i in idx], axis=1)
    bottom = np.concatenate([anon[i] for i in idx], axis=1)
    grid = np.concatenate([top, bottom], axis=0)
    png_path = os.path.join(out_dir, f"{base}_grid.png")
    Image.fromarray(grid).save(png_path)
    return {"video": video_path, "grid": png_path}
