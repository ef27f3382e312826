"""Shared CLI scaffolding for the stage entry scripts.

Mirrors the reference's script conventions (``python <script> --params f.py --run_id id
--devices N``, train_anonymizer.py:557-573) and adds ``--synthetic`` so every stage runs
end-to-end on in-memory data (SURVEY.md §4 test strategy, promoted to a first-class CLI).
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow running from a source checkout without installation.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def base_parser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--params", type=str, default=None,
                    help="reference-style params_*.py overlay (importlib-loaded)")
    ap.add_argument("--run_id", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=None, help="override num_epochs")
    ap.add_argument("--save_dir", type=str, default="saved_models")
    ap.add_argument("--synthetic", action="store_true",
                    help="run on synthetic in-memory data (no datasets needed)")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--devices", type=int, default=0,
                    help="virtual CPU device count (0 = real devices)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard batches over all visible devices (data-parallel)")
    ap.add_argument("--seed", type=int, default=0)
    return ap


def add_extraction_args(ap: argparse.ArgumentParser) -> None:
    """Flags shared by the extraction-driven entry points (extract_features.py and
    score_video.py) — one definition so the two CLIs cannot drift."""
    ap.add_argument("--videos_glob", type=str, default=None)
    ap.add_argument("--saved_model_fa", type=str, default=None)
    ap.add_argument("--saved_model_ft", type=str, default=None)
    ap.add_argument("--raw", action="store_true", help="skip anonymization (raw features)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode_mode", type=str, default="rgb", choices=["rgb", "yuv"],
                    help="'yuv': planar ingest — half the host->device bytes, "
                         "chroma upsample + BT.601 fused into the device preprocess "
                         "(reads at native resolution; set --decode_hw to match)")
    ap.add_argument("--decode_hw", type=int, nargs=2, default=None, metavar=("H", "W"),
                    help="decode resolution (default 240 320); in yuv mode must equal "
                         "the videos' native resolution")
    ap.add_argument("--decode_fast", action="store_true",
                    help="skip the h264 in-loop deblocking filter during decode "
                         "(~8%% faster software decode; NOT bit-exact with reference "
                         "decode — sub-pixel frame differences before the 224^2 resize)")
    ap.add_argument("--num_workers", type=int, default=8,
                    help="host decode threads — the throughput knob when extraction is "
                         "decode-bound (~1 host core per software-decode thread; size to "
                         "the host's core budget)")
    ap.add_argument("--ncrops", type=int, default=None, choices=[1, 5, 10],
                    help="TTA crop fan-out: 5 = corners + center, 10 = + hflips (the "
                         "published MGFN feature layout; the reference only does center "
                         "crop). Features become (num_clips, ncrops, 2048); ~ncrops x "
                         "device compute")
    ap.add_argument("--quant", type=str, default=None, choices=["none", "int8"],
                    help="opt-in W8A8 int8 serving mode for the fa anonymizer: "
                         "calibrates activation scales on the run's first batches, "
                         "then extracts with int8 MXU convs (~1.6-1.8x bf16 conv rate "
                         "on v5e). Logs feature cosine similarity vs the bf16 path")
    ap.add_argument("--quant_calib_batches", type=int, default=None,
                    help="batches used for int8 activation calibration (default 2)")


def resolve_extraction_inputs(args, p, *, n_synthetic: int = 4):
    """Apply the shared CLI overrides to FeatureExtractionParams and resolve the input
    list: returns ``(p, uris, decode_hw)``.

    Synthetic mode shrinks to tiny shapes and procedural ``synthetic://`` URIs
    (40x80 @ crop 0.8 -> (32, 64) at even offsets: valid for both decode modes —
    yuv needs a chroma-aligned crop window). A ``--videos_glob`` that matches zero
    files is a hard error: a silently-empty run is indistinguishable from success
    in automation."""
    overrides = {"anonymized": not args.raw}
    if getattr(args, "decode_fast", False):
        # Flag only turns it on (a params-file decode_fast=True stays).
        overrides["decode_fast"] = True
    if args.saved_model_fa:  # CLI only overrides when given (params files win otherwise)
        overrides["saved_model_fa"] = args.saved_model_fa
    if args.saved_model_ft:
        overrides["saved_model_ft"] = args.saved_model_ft
    if getattr(args, "ncrops", None):
        overrides["ncrops"] = args.ncrops
    if getattr(args, "quant", None):
        overrides["quant"] = args.quant
    if getattr(args, "quant_calib_batches", None):
        overrides["quant_calib_batches"] = args.quant_calib_batches
    p = p.replace(**overrides)
    if args.synthetic:
        p = p.replace(num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
        uris = [f"synthetic://n=120,h=40,w=80,seed={i}" for i in range(n_synthetic)]
        decode_hw = (40, 80)
    else:
        import glob

        if not args.videos_glob:
            raise SystemExit("pass --videos_glob or --synthetic")
        uris = sorted(glob.glob(args.videos_glob))
        if not uris:
            raise SystemExit(f"--videos_glob {args.videos_glob!r} matched no files")
        decode_hw = tuple(args.decode_hw) if args.decode_hw else (240, 320)
    return p, uris, decode_hw


def maybe_mesh(args):
    """Build the 1-D data-parallel mesh when --mesh is set (after setup_platform)."""
    if not getattr(args, "mesh", False):
        return None
    from ted_spad_tpu.parallel import data_parallel_mesh

    return data_parallel_mesh()


def setup_platform(args) -> None:
    """Must run before any jax backend touch."""
    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={args.devices}").strip()
        args.cpu = True
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache for every stage/serving entry point: a cold
    # score_video invocation was paying a ~7 min client-side recompile of the
    # fused extraction program per process (measured round 4); plain jit
    # programs verifiably hit this cache across processes.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_tpu_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def finalize_params(p, args):
    from ted_spad_tpu.config.params import apply_params_file

    p = apply_params_file(p, args.params)
    if args.run_id:
        p = p.replace(run_id=args.run_id)
    return p


def synthetic_crime_fixture(n_abnormal: int = 3, n_normal: int = 3, *, num_frames: int = 96,
                            h: int = 48, w: int = 64, frames_per_clip: int = 32,
                            clip_span: int = 15, clip_step: int = 16):
    """Synthetic UCF-Crime stand-in for pipeline/parity dry runs: abnormal-family videos
    FIRST (the abnormal-first list split, datasets/dataset.py:26-48) with their opening
    clips marked anomalous in the gt — a plumbing check, not a benchmark.

    Returns (uris, gt, abnormal_split). ``clip_span``/``clip_step`` must match the
    extraction params (span = (num_frames-1)*fix_skip + 1 at the dry-run shape).
    """
    import numpy as np

    clips = len(range(0, num_frames - clip_span + 1, clip_step))
    uris, gts = [], []
    for i in range(n_abnormal):  # abnormal family: class 7 structure
        uris.append(f"synthetic://n={num_frames},h={h},w={w},seed={7000 + i}")
        m = np.zeros(clips * frames_per_clip, np.float32)
        m[: 2 * frames_per_clip] = 1.0
        gts.append(m)
    for i in range(n_normal):  # normal family: class 1 structure
        uris.append(f"synthetic://n={num_frames},h={h},w={w},seed={1000 + i}")
        gts.append(np.zeros(clips * frames_per_clip, np.float32))
    return uris, np.concatenate(gts), n_abnormal
