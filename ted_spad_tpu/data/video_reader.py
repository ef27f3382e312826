"""Python binding for the native video decode layer (native/videodec/libvideodec.so).

Replaces the reference's decord (ucf101_dl.py:12-19), DALI video reader
(dali_extraction.py:53-81) and cv2 loop (shanghai_dl.py:45-83) with one C++/FFmpeg
decoder exposed through ctypes (GIL released during decode — a Python thread pool gives
multi-video parallelism, the host-side analogue of DALI's decode threads).

Fallback: if the shared library (or FFmpeg) is unavailable, ``SyntheticVideoReader``
serves deterministic procedurally-generated frames so every pipeline and test runs
without media assets.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "videodec")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libvideodec.so"))
_lib = None
_lib_error: str | None = None


def _load_library():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        # Always run make (a no-op when the .so is fresh): a stale prebuilt library
        # missing newer symbols would otherwise latch _lib_error on the first
        # missing-attribute access and permanently disable the native layer. An
        # exclusive file lock serializes concurrent builders (decode pool threads,
        # jax.distributed ranks) — make writes the .so non-atomically.
        try:
            import fcntl

            with open(os.path.join(os.path.dirname(_LIB_PATH), ".build.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                subprocess.run(
                    ["make", "-C", os.path.dirname(_LIB_PATH)], check=True, capture_output=True
                )
        except Exception:  # noqa: BLE001
            if not os.path.exists(_LIB_PATH):
                raise  # nothing to load and no way to build it
            # Build toolchain unavailable (deployment image) but a prebuilt .so
            # exists: load it as-is.
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.vd_open_opts.restype = ctypes.c_void_p
        lib.vd_open_opts.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_num_frames.restype = ctypes.c_int64
        lib.vd_num_frames.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_width.restype = ctypes.c_int
        lib.vd_width.argtypes = [ctypes.c_void_p]
        lib.vd_height.restype = ctypes.c_int
        lib.vd_height.argtypes = [ctypes.c_void_p]
        lib.vd_read_indices.restype = ctypes.c_int64
        lib.vd_read_indices.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vd_read_strided.restype = ctypes.c_int64
        lib.vd_read_strided.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vd_last_error.restype = ctypes.c_char_p
        lib.vd_native_width.restype = ctypes.c_int
        lib.vd_native_width.argtypes = [ctypes.c_void_p]
        lib.vd_native_height.restype = ctypes.c_int
        lib.vd_native_height.argtypes = [ctypes.c_void_p]
        lib.vd_full_range.restype = ctypes.c_int
        lib.vd_full_range.argtypes = [ctypes.c_void_p]
        lib.vd_colorspace.restype = ctypes.c_int
        lib.vd_colorspace.argtypes = [ctypes.c_void_p]
        lib.vd_read_strided_yuv.restype = ctypes.c_int64
        lib.vd_read_strided_yuv.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ve_open.restype = ctypes.c_void_p
        lib.ve_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_char_p,
        ]
        lib.ve_open_cs.restype = ctypes.c_void_p
        lib.ve_open_cs.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.ve_write.restype = ctypes.c_int
        lib.ve_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.ve_close.restype = ctypes.c_int
        lib.ve_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — degrade to synthetic reader
        _lib_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


class VideoReader:
    """Random-access + strided frame reader over one video file (RGB24 numpy out).

    ``threads``: decoder thread_count (0 = libavcodec auto). Pool-driven consumers
    (extraction/training loaders, one decoder per worker) pass 1 to avoid
    per-decoder frame-thread oversubscription on many-core hosts.
    ``fast``: skip the h264/hevc in-loop deblocking filter (+ non-bitexact codec
    speedups) — NOT bit-exact with reference decode; opt-in for throughput-bound
    extraction where frames are resized to 224² downstream.
    """

    def __init__(self, path: str, out_w: int = 0, out_h: int = 0,
                 threads: int = 0, fast: bool = False):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native videodec unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.vd_open_opts(path.encode(), out_w, out_h, threads, int(fast))
        if not self._h:
            raise IOError(f"cannot open {path}: {lib.vd_last_error().decode()}")
        self.path = path
        self.width = lib.vd_width(self._h)
        self.height = lib.vd_height(self._h)
        self.fps = lib.vd_fps(self._h)
        self._num_frames = int(lib.vd_num_frames(self._h))
        if self._num_frames < 0:
            # No nb_frames and no usable duration (raw elementary streams, some live
            # captures): every consumer needs len() for clip windowing, and a -1
            # would otherwise surface as an opaque "__len__ should be >= 0" — fail
            # here with a clear message the corrupt-video tolerance can log.
            lib.vd_close(self._h)
            self._h = None
            raise IOError(f"{path}: frame count unknown (no nb_frames and no usable duration)")

    def _handle(self):
        if not self._h:
            raise IOError(f"VideoReader for {self.path} is closed")
        return self._h

    @property
    def colorspace(self) -> int:
        """Stream colorspace family: 601, 709, 0 (untagged — swscale assumes 601),
        -1 (other, e.g. BT.2020). RGB reads honor 601/709 per-frame (native to_rgb
        selects the matrix); the planar ingest path converts on device with the
        family this reports (ops/yuv.py ``bt709`` row flags). -1 is rejected."""
        return int(self._lib.vd_colorspace(self._handle()))

    def __len__(self) -> int:
        return self._num_frames

    def _raise_or_pad(self, got: int, n: int, planes, fills) -> None:
        """Shared short-read epilogue. ``got < 0``: the native layer reported a
        demux/decode/conversion FAILURE — raise so the corrupt-video tolerance skips
        the file instead of padding frozen garbage over it. ``got < n``: benign EOF
        (estimated frame counts overshoot) — pad with the last delivered frame, or
        the neutral fill when nothing was delivered (never leak uninitialized
        memory)."""
        if got < 0:
            raise IOError(
                f"read failed for {self.path}: {self._lib.vd_last_error().decode()}"
            )
        if got < n:
            for p, fill in zip(planes, fills):
                if got == 0:
                    p[:] = fill
                else:
                    p[got:] = p[got - 1]

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """decord ``VideoReader.get_batch`` semantics (ucf101_dl.py:68, 91): frames in
        the REQUESTED order -> (n, H, W, 3) uint8. Order matters: the palindrome
        short-clip completion (ucf101_dl.py:550-567, data/videos.py) produces
        non-monotonic index lists whose reversed tail must survive. Decoding still
        happens once per unique frame in ascending order (the decoder seeks forward),
        then frames are gathered back into request order."""
        req = np.asarray([int(i) for i in indices], dtype=np.int64)
        uniq = np.unique(req)  # sorted ascending, deduplicated
        dec = np.empty((len(uniq), self.height, self.width, 3), dtype=np.uint8)
        n = self._lib.vd_read_indices(
            self._handle(),
            uniq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(uniq),
            dec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        self._raise_or_pad(n, len(uniq), (dec,), (0,))
        return dec[np.searchsorted(uniq, req)]

    def read_strided_yuv(self, start: int, n: int, stride: int):
        """Planar ingest read: ``(y (n,H,W), u (n,H/2,W/2), v (n,H/2,W/2), full_range)``
        at NATIVE resolution — 1.5 bytes/px instead of RGB24's 3, no host-side color
        conversion; chroma upsample + BT.601 happen in the device preprocess
        (ops/yuv.py). EOF short-reads pad with the last frame like ``read_strided``."""
        h = self._handle()
        nh = self._lib.vd_native_height(h)
        nw = self._lib.vd_native_width(h)
        y = np.empty((n, nh, nw), np.uint8)
        u = np.empty((n, nh // 2, nw // 2), np.uint8)
        v = np.empty((n, nh // 2, nw // 2), np.uint8)
        got = self._lib.vd_read_strided_yuv(
            h, start, n, stride,
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        # Neutral fill: Y=0, U=V=128 decodes to black (U=V=0 would be green).
        self._raise_or_pad(got, n, (y, u, v), (0, 128, 128))
        return y, u, v, bool(self._lib.vd_full_range(h))

    def read_strided(self, start: int, n: int, stride: int) -> np.ndarray:
        """DALI-style sequence read: n frames at ``start + i*stride`` (dali_extraction.py:72)."""
        out = np.empty((n, self.height, self.width, 3), dtype=np.uint8)
        got = self._lib.vd_read_strided(
            self._handle(), start, n, stride, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        self._raise_or_pad(got, n, (out,), (0,))
        return out

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


class SyntheticVideoReader:
    """Deterministic procedural video for tests/benches: frame ``i`` is a content-varying
    pattern keyed by (seed, i) — replaces media fixtures (SURVEY.md §4 strategy).

    Class-learnability convention: ``seed // 1000`` selects a *stable* visual structure
    (spatial stripe frequency + motion direction) while ``seed % 1000`` adds per-video
    phase/offset variation — so datasets built as ``seed = label * 1000 + idx``
    (data/videos.synthetic_video_items) carry a genuinely learnable class signal, and e2e
    trainer tests can assert above-chance accuracy rather than mere finiteness."""

    def __init__(self, num_frames: int = 300, height: int = 240, width: int = 320, seed: int = 0, fps: float = 30.0):
        self._n = num_frames
        self.height = height
        self.width = width
        self.fps = fps
        self.seed = seed

    def _frame(self, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0 : self.height, 0 : self.width]
        cls = self.seed // 1000
        noise = self.seed % 1000
        freq = 1 + (cls % 5)  # class-determined stripe frequency
        direction = 1 if cls % 2 == 0 else -1  # class-determined motion direction
        phase = (noise * 13 + direction * i * 6) % 256
        r = (xx * freq * 255 // max(self.width - 1, 1) + phase) % 256
        g = (yy * freq * 255 // max(self.height - 1, 1) + 2 * phase) % 256
        b = np.full_like(r, (i * 7 * direction + noise) % 256)
        return np.stack([r, g, b], axis=-1).astype(np.uint8)

    def __len__(self) -> int:
        return self._n

    colorspace = 601  # the emulated planar encode below is BT.601

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        # Clamp past-EOF indices to the last frame — the native reader's EOF padding
        # semantics (and read_strided's clamp); wrapping modulo would make synthetic
        # fixtures behave differently from real media on off-by-one index math.
        return np.stack([self._frame(min(int(i), self._n - 1)) for i in indices])

    def read_strided(self, start: int, n: int, stride: int) -> np.ndarray:
        return self.get_batch([min(start + i * stride, self._n - 1) for i in range(n)])

    def read_strided_yuv(self, start: int, n: int, stride: int):
        """Planar-mode emulation: BT.601 limited-range encode of the RGB frames with
        2x2 box-averaged chroma — lets the YUV ingest pipeline run in CPU tests."""
        rgb = self.read_strided(start, n, stride).astype(np.float32)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
        u = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
        v = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0

        def sub(p):
            h2, w2 = p.shape[-2] // 2, p.shape[-1] // 2
            p = p[..., : h2 * 2, : w2 * 2].reshape(p.shape[0], h2, 2, w2, 2)
            return p.mean((2, 4))

        to_u8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
        return to_u8(y), to_u8(sub(u)), to_u8(sub(v)), False

    def close(self):
        pass


def open_video(path: str, out_w: int = 0, out_h: int = 0,
               threads: int = 0, fast: bool = False):
    """Open a real video if the native layer is up; ``synthetic://n=N,h=H,w=W,seed=S`` URIs
    produce procedural videos for tests. ``threads``/``fast`` as in VideoReader
    (ignored by the synthetic reader)."""
    if path.startswith("synthetic://"):
        kv = dict(part.split("=") for part in path[len("synthetic://") :].split(",") if part)
        return SyntheticVideoReader(
            num_frames=int(kv.get("n", 300)),
            height=int(kv.get("h", 240)),
            width=int(kv.get("w", 320)),
            seed=int(kv.get("seed", 0)),
        )
    return VideoReader(path, out_w, out_h, threads=threads, fast=fast)


class VideoWriter:
    """Streaming RGB24 -> mp4 (libx264, mpeg4 fallback) encoder over the native layer —
    the imageio.mimwrite replacement (visualize_anonymization.py:84-115). Odd frame
    dimensions are cropped by one pixel (yuv420p needs even sizes).

    ``colorspace``: 0 writes an untagged stream with swscale's default (BT.601)
    RGB->YUV (legacy behavior); 601/709 tags the stream (VUI, limited range) AND
    converts with the matching matrix, so tag-honoring decoders — including our own
    RGB and planar-YUV ingest paths — reproduce the input RGB."""

    def __init__(self, path: str, width: int, height: int, fps: float = 25.0, codec: str = "",
                 colorspace: int = 0):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native videodec unavailable: {_lib_error}")
        if colorspace not in (0, 601, 709):
            raise ValueError(f"colorspace must be 0, 601 or 709, got {colorspace}")
        self._lib = lib
        self.width = width - (width % 2)
        self.height = height - (height % 2)
        self._h = lib.ve_open_cs(path.encode(), self.width, self.height, float(fps),
                                 codec.encode(), colorspace)
        if not self._h:
            raise IOError(f"cannot open encoder for {path}: {lib.vd_last_error().decode()}")
        self.path = path

    def write(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        if (frame.ndim != 3 or frame.shape[0] < self.height
                or frame.shape[1] < self.width or frame.shape[2] != 3):
            # ve_write reads height*width*3 bytes unconditionally — an undersized or
            # grayscale frame would be an out-of-bounds read, not a soft error.
            raise ValueError(
                f"frame shape {frame.shape} incompatible with {self.height}x"
                f"{self.width}x3 encoder (larger frames are cropped, never padded)"
            )
        frame = np.ascontiguousarray(frame[: self.height, : self.width], dtype=np.uint8)
        rc = self._lib.ve_write(self._h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"encode failed: {self._lib.vd_last_error().decode()}")

    def close(self) -> None:
        if self._h:
            rc = self._lib.ve_close(self._h)
            self._h = None
            if rc != 0:
                raise IOError("mp4 finalize failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


def write_mp4(path: str, frames: np.ndarray, fps: float = 25.0, codec: str = "",
              colorspace: int = 0) -> str:
    """Write (T, H, W, 3) uint8 RGB frames as an .mp4 via the native encoder.
    ``colorspace`` as in VideoWriter (0 untagged/601-math, 601, 709)."""
    frames = np.asarray(frames, dtype=np.uint8)
    _, h, w, _ = frames.shape
    with VideoWriter(path, w, h, fps=fps, codec=codec, colorspace=colorspace) as vw:
        for frame in frames:
            vw.write(frame)
    return path


def write_y4m(path: str, frames: np.ndarray, fps: int = 25) -> str:
    """Write (T, H, W, 3) uint8 RGB as a YUV4MPEG2 (C444) file — a pure-Python encoder so
    decoder tests have a real container/codec path without an ffmpeg binary."""
    frames = np.asarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    rgb = frames.astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    # BT.601 full-range RGB -> YCbCr.
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444 XCOLORRANGE=FULL\n".encode())
        for i in range(t):
            f.write(b"FRAME\n")
            for plane in (y[i], cb[i], cr[i]):
                f.write(np.clip(plane + 0.5, 0, 255).astype(np.uint8).tobytes())
    return path
