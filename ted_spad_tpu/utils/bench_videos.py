"""Realistic benchmark video fixtures for decode-throughput measurement.

The round-3 decode sweep reused 8 cache-hot 240p moving-gradient clips — an easy
entropy-coding case that overstated decode throughput (VERDICT r3 weak #4). This
module generates a *unique, varied* H.264 fixture set with realistic coding
complexity so the "host can feed the chip" core-budget claim is measured on
representative work (the reference never had the problem: DALI decoded on GPU
NVDEC, dali_extraction.py:53-81):

- 32 unique videos (no file repeated): per-video random scene seeds
- mixed resolutions incl. >=480p (UCF-Crime is 240-480p H.264) and two 1000+
  frame files (UCF-Crime videos run minutes, not seconds)
- scene content with motion structure x264 treats like natural video: textured
  moving sprites over a drifting background plus low-amplitude sensor noise
  (pure noise benchmarks the entropy coder's worst case; pure gradients its
  best — both are wrong for a throughput claim)

Generation is one-time and cached under ``.bench_videos/<spec-tag>/`` in the
working directory (gitignored); bench.py budget-gates generation and falls back
to a reduced set when the remaining envelope cannot afford the full one.
"""

from __future__ import annotations

import os

import numpy as np

# (count, width, height, frames) — 32 unique videos total.
FULL_SPEC = ((20, 320, 240, 300), (8, 640, 480, 300), (2, 854, 480, 1000), (2, 320, 240, 1100))
# Reduced fallback when the bench envelope cannot afford full generation.
REDUCED_SPEC = ((12, 320, 240, 300), (4, 640, 480, 300))


def _spec_tag(spec) -> str:
    return "s" + "_".join(f"{c}x{w}x{h}x{f}" for c, w, h, f in spec)


def synth_scene_frames(seed: int, width: int, height: int, t0: int, t1: int) -> np.ndarray:
    """Frames [t0, t1) of a deterministic synthetic scene: drifting textured
    background + 5 moving textured sprites + mild sensor noise. Returns
    (t1-t0, H, W, 3) uint8."""
    rng = np.random.default_rng(seed)
    n_sprites = 5
    # Static per-scene draws (independent of the frame range requested).
    tex_h, tex_w = height // 4, width // 4
    textures = rng.integers(40, 216, (n_sprites, tex_h, tex_w, 3), dtype=np.uint8)
    sp_w = rng.integers(width // 8, width // 3, n_sprites)
    sp_h = rng.integers(height // 8, height // 3, n_sprites)
    sx0 = rng.uniform(0, width, n_sprites)
    sy0 = rng.uniform(0, height, n_sprites)
    svx = rng.uniform(-3.0, 3.0, n_sprites)
    svy = rng.uniform(-2.0, 2.0, n_sprites)
    bg_phase = rng.uniform(0, 2 * np.pi, 2)
    pan = rng.uniform(-1.5, 1.5, 2)
    noise_seed = int(rng.integers(0, 2**31))

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    out = np.empty((t1 - t0, height, width, 3), np.uint8)
    nrng = np.random.default_rng(noise_seed + t0)  # noise decorrelated per chunk
    for i, t in enumerate(range(t0, t1)):
        # Smooth drifting background (camera pan).
        bx, by = xx + pan[0] * t, yy + pan[1] * t
        bg = (
            110
            + 55 * np.sin(bx / 97 + bg_phase[0] + t / 240.0)
            + 45 * np.cos(by / 71 + bg_phase[1])
        )
        frame = np.repeat(bg[..., None], 3, axis=-1)
        frame[..., 1] *= 0.92  # mild color cast so planes differ
        frame[..., 2] *= 0.85
        for s in range(n_sprites):
            # Sprite position bounces inside the frame.
            px = sx0[s] + svx[s] * t
            py = sy0[s] + svy[s] * t
            w_s, h_s = int(sp_w[s]), int(sp_h[s])
            px = int(abs(px) % max(2 * (width - w_s), 1))
            py = int(abs(py) % max(2 * (height - h_s), 1))
            if px > width - w_s:
                px = 2 * (width - w_s) - px
            if py > height - h_s:
                py = 2 * (height - h_s) - py
            tex = textures[s]
            tile = np.tile(tex, ((h_s + tex_h - 1) // tex_h, (w_s + tex_w - 1) // tex_w, 1))
            frame[py : py + h_s, px : px + w_s] = tile[:h_s, :w_s]
        frame += nrng.normal(0.0, 5.0, frame.shape).astype(np.float32)
        out[i] = np.clip(frame, 0, 255).astype(np.uint8)
    return out


def generate_fixture_set(
    root: str = ".bench_videos",
    spec=FULL_SPEC,
    fps: float = 25.0,
    log_fn=None,
) -> list[str]:
    """Generate (or reuse) the fixture set; returns the list of video paths.

    Idempotent: a completed set is detected by a DONE marker and reused, so the
    one-time x264 encode cost (minutes at 480p on a 1-core host) is paid once per
    working directory, not per bench run."""
    from ted_spad_tpu.data.video_reader import VideoWriter

    out_dir = os.path.join(root, _spec_tag(spec))
    done = os.path.join(out_dir, "DONE")
    paths = []
    idx = 0
    for count, w, h, f in spec:
        for _ in range(count):
            paths.append(os.path.join(out_dir, f"bv{idx:02d}_{w}x{h}x{f}.mp4"))
            idx += 1
    if os.path.exists(done):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    idx = 0
    for count, w, h, f in spec:
        for _ in range(count):
            path = paths[idx]
            if not os.path.exists(path + ".ok"):
                with VideoWriter(path, w, h, fps=fps) as vw:
                    for t0 in range(0, f, 100):  # chunked: 480p x 1000 frames > 1 GB raw
                        for frame in synth_scene_frames(idx, w, h, t0, min(t0 + 100, f)):
                            vw.write(frame)
                with open(path + ".ok", "w") as fh:
                    fh.write("ok")
                if log_fn:
                    log_fn(f"bench_videos: encoded {os.path.basename(path)}")
            idx += 1
    with open(done, "w") as fh:
        fh.write(_spec_tag(spec))
    return paths
