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

from ted_spad_tpu.data.video_reader import native_available, open_video, write_y4m
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
    out_name: str | None = None,
) -> dict[str, str]:
    """Write ``<name>_anon.mp4`` (Y4M fallback) + ``<name>_grid.png``
    (original|anonymized rows).

    Frames genuinely stream: each decoded chunk is anonymized on device and encoded
    immediately (VideoWriter is per-frame streaming), so host memory stays
    O(chunk + grid samples) — a 2 h surveillance video never materializes in RAM.

    ``out_name`` overrides the default basename-derived stem; callers visualizing a
    LIST of videos should pass ``utils.naming.dedup_names`` stems so same-basename
    videos in different directories don't clobber each other's artifacts (the same
    rule extraction applies to its .npy outputs).
    """
    from ted_spad_tpu.data.video_reader import VideoWriter
    from ted_spad_tpu.utils.naming import base_name

    os.makedirs(out_dir, exist_ok=True)
    h, w = size
    fa_model, fa_vars = load_fa_model(saved_model_fa, arch=arch_fa, image_size=(h, w), dtype=dtype)
    if fa_variables is not None:
        fa_vars = fa_variables
    anonymize = make_anonymize_fn(fa_model, fa_vars)

    base = out_name or base_name(video_uri)
    vr = open_video(video_uri, w, h)
    n = len(vr)
    fps = vr.fps if getattr(vr, "fps", 0) else 25.0
    grid_idx = set(np.linspace(0, max(n - 1, 0), sample_grid_frames).astype(int).tolist())
    grid_orig: dict[int, np.ndarray] = {}
    grid_anon: dict[int, np.ndarray] = {}

    writer = None
    # Y4M fallback (native encoder absent — dev/test environments only) buffers the
    # anonymized stream; the mp4 path streams every frame straight to the encoder.
    y4m_frames = [] if not native_available() else None
    if native_available():
        video_path = os.path.join(out_dir, f"{base}_anon.mp4")
        # Explicit BT.601 tag: untagged streams at HD sizes get assumed BT.709 by
        # players, shifting the anonymization preview's colors.
        writer = VideoWriter(video_path, w, h, fps=fps, colorspace=601)
    else:
        video_path = os.path.join(out_dir, f"{base}_anon.y4m")

    try:
        for start in range(0, n, chunk):
            count = min(chunk, n - start)
            frames = vr.read_strided(start, count, 1)
            out = np.asarray(anonymize(jnp.asarray(frames)))
            anon_u8 = (out * 255.0 + 0.5).astype(np.uint8)
            if writer is not None:
                for f in anon_u8:
                    writer.write(f)
            else:
                y4m_frames.append(anon_u8)
            for i in range(start, start + count):
                if i in grid_idx:
                    grid_orig[i] = frames[i - start]
                    grid_anon[i] = anon_u8[i - start]
    finally:
        vr.close()
        if writer is not None:
            writer.close()
    if y4m_frames is not None:
        write_y4m(video_path, np.concatenate(y4m_frames), fps=int(round(fps)))

    # Side-by-side sample grid (original top row, anonymized bottom row).
    from PIL import Image

    idx = sorted(grid_orig)
    top = np.concatenate([grid_orig[i] for i in idx], axis=1)
    bottom = np.concatenate([grid_anon[i] for i in idx], axis=1)
    grid = np.concatenate([top, bottom], axis=0)
    png_path = os.path.join(out_dir, f"{base}_grid.png")
    Image.fromarray(grid).save(png_path)
    return {"video": video_path, "grid": png_path}
