"""Decode access-pattern benchmark for the native video layer (native/videodec).

Measures the patterns the pipeline actually issues (reference equivalents cited):
  sequential  - non-overlapping strided clip windows in order (DALI sequence reader,
                dali_extraction.py:72-73 / extraction hot path)
  random      - random clip starts (training sampler, ucf101_dl.py:65-146)
  backward    - clips in reverse order (seek worst case: every read seeks backwards;
                exercises the pts-recovery back-off in videodec.cpp seek_to)
  sparse      - linspace get_batch over the whole file (val mode, ucf101_dl.py:253-294)

Usage: python scripts/bench_decode.py [--frames 1500] [--clips 24]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import tempfile
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from ted_spad_tpu.data.video_reader import native_available, open_video, write_mp4


def make_video(path: str, n_frames: int, h: int = 240, w: int = 320) -> None:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    chunk = 128
    frames_all = []
    for s in range(0, n_frames, chunk):
        t = np.arange(s, min(s + chunk, n_frames), dtype=np.float32)[:, None, None]
        plane = 127.5 + 60 * np.sin(xx / 24 + t / 7) + 50 * np.cos(yy / 31 - t / 11)
        frames_all.append(np.clip(plane, 0, 255).astype(np.uint8)[..., None].repeat(3, -1))
    write_mp4(path, np.concatenate(frames_all), fps=25.0)


def bench(tag, fn, n_frames_read):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{tag:12s} {n_frames_read:5d} frames in {dt:7.3f}s = {n_frames_read/dt:8.1f} fps")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--clip_len", type=int, default=16)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--fast", action="store_true",
                    help="skip the h264 in-loop deblocking filter (measured ~8% faster)")
    ap.add_argument("--threads", type=int, default=0,
                    help="decoder thread_count (0 = libavcodec auto; pools use 1)")
    args = ap.parse_args()
    if not native_available():
        print("native videodec unavailable; nothing to measure")
        return

    tmp = tempfile.mkdtemp(prefix="bench_decode_")
    path = _os.path.join(tmp, "v.mp4")
    make_video(path, args.frames)
    span = (args.clip_len - 1) * args.stride + 1
    starts = np.linspace(0, args.frames - span - 1, args.clips).astype(int)
    rng = np.random.default_rng(0)
    rand_starts = rng.integers(0, args.frames - span, args.clips)
    nf = args.clips * args.clip_len

    vr = open_video(path, threads=args.threads, fast=args.fast)
    bench("sequential", lambda: [vr.read_strided(int(s), args.clip_len, args.stride) for s in starts], nf)
    bench("random", lambda: [vr.read_strided(int(s), args.clip_len, args.stride) for s in rand_starts], nf)
    bench("backward", lambda: [vr.read_strided(int(s), args.clip_len, args.stride) for s in starts[::-1]], nf)
    idx = np.linspace(0, args.frames - 1, nf).astype(int)
    bench("sparse", lambda: vr.get_batch(idx), nf)
    vr.close()


if __name__ == "__main__":
    main()
