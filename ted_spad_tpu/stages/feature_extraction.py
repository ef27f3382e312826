"""Feature extraction — the throughput-critical stage (BASELINE.json north star).

Reference: feature_extraction/dali_extraction.py (DALI GPU decode, batch_size=1 clip,
:103-182) and st_feature_extraction.py (cv2 sequential loop). Windowing: 16-frame clips at
stride 2, non-overlapping step 32 (dali_extraction.py:72-73); val transform /255 +
center-crop 0.8 + resize 224 (:38-50); frozen fa per-frame then ft.extract_features ->
2048-d per clip, vstacked to a per-video ``.npy`` (:168-182); resume by skipping existing
files (:121).

TPU redesign (why this beats one-clip-at-a-time DALI):
  - host C++ decode threads (native/videodec) run ahead of the device, packing clips from
    MULTIPLE videos into large fixed-shape batches — the MXU sees (B, 16, 224, 224, 3)
    bf16 work instead of the reference's batch_size=1 (params_feature_ex.py:4);
  - preprocessing (normalize/crop/resize) + fa + ft fuse into ONE jitted XLA program, so
    intermediate frames never round-trip HBM<->host;
  - dispatch is async: the host assembles batch N+1 while the device computes batch N
    (double buffering for free through JAX's dispatch queue);
  - multi-chip: the video list is sharded per process (dali_extraction.py:63-64's
    num_shards/shard_id equivalent) and the clip batch is sharded over local chips.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.config.params import FeatureExtractionParams
from ted_spad_tpu.data.video_reader import open_video
from ted_spad_tpu.models import load_fa_model, load_ft_model
from ted_spad_tpu.ops.augment import center_crop_resize, multi_crop_resize


@dataclasses.dataclass
class ClipRef:
    video_idx: int
    clip_idx: int


def video_clip_starts(num_frames_total: int, num_frames: int, stride: int, step: int) -> list[int]:
    """Non-overlapping window starts: 0, step, 2*step... while a full strided clip fits;
    videos shorter than one clip still produce one (pad_last_batch/last-frame repeat,
    dali_extraction.py:66-76; shanghai_dl.py:84-94)."""
    span = (num_frames - 1) * stride + 1
    starts = list(range(0, max(num_frames_total - span + 1, 1), step))
    return starts


def iter_clip_batches(
    video_uris: Sequence[str],
    p: FeatureExtractionParams,
    batch_size: int,
    *,
    decode_hw: tuple[int, int] = (240, 320),
    num_workers: int = 8,
    decode_mode: str = "rgb",
    on_error: Callable[[int, str], None] | None = None,
) -> Iterator[tuple[Any, list[ClipRef], dict[int, int]]]:
    """Stream clip batches packed across videos.

    ``decode_mode="rgb"``: batches are (batch_size, T, H, W, 3) uint8.
    ``decode_mode="yuv"``: batches are ONE packed (batch_size, T, H*W*3//2 + 1) uint8
    buffer of [Y | U | V | tag] rows at native resolution — 1.5 bytes/px of
    host->device traffic in a single contiguous transfer, no host-side color
    conversion (the planar ingest mode; ops/yuv.py unpacks and converts on device).
    The trailing tag byte is a bitmask (bit 0 = BT.709 matrix, bit 1 = full-range
    yuvj/pc transfer) so one compiled program converts mixed batches with the right
    coefficients per clip. Exotically-tagged (BT.2020 etc.) sources are rejected —
    use rgb mode for those.

    ``on_error``: when given, a video whose decode raises is skipped — the callback
    receives (video_idx, error_repr) and no clips from that video are yielded (its
    decode is all-or-nothing, so a mid-video failure never leaks partial clips).
    When None, decode errors propagate (strict mode — benches/tests). This is the
    reference's corrupt-video tolerance (ucf101_dl.py:143-146 return-None + filter)
    applied to extraction, which real UCF-Crime needs (broken files exist).

    Yields (clips, refs, clip_counts) where refs map batch rows to (video, clip) and
    clip_counts gives each video's total clips (known once its decode finishes). The last
    batch is padded by repeating the final clip (rows beyond refs are padding).
    """
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    clip_counts: dict[int, int] = {}

    # One decoder per pool worker is the parallelism when there are many videos —
    # libavcodec frame-threading on top would oversubscribe many-core hosts. With
    # FEWER videos than workers (the serving case: scripts/score_video.py on one
    # long video), the idle worker budget is reassigned as frame threads instead,
    # so a lone video decodes with the full core budget rather than one core.
    # Threading never changes decoded pixels (test_video_reader.TestDecodeOpts).
    decoder_threads = max(1, num_workers // max(len(video_uris), 1))

    def decode_video(vi: int):
        uri = video_uris[vi]
        vr = open_video(
            uri, decode_hw[1], decode_hw[0],
            threads=decoder_threads, fast=getattr(p, "decode_fast", False),
        )
        starts = video_clip_starts(len(vr), p.num_frames, p.clip_stride, p.clip_step)
        if decode_mode == "yuv":
            cs = getattr(vr, "colorspace", 0)  # per-video property — check once
            if cs not in (0, 601, 709):  # untagged is swscale's 601 default
                raise RuntimeError(
                    f"{uri}: colorspace tag {cs} — the YUV ingest path supports "
                    "BT.601 (and untagged, swscale's default) and BT.709; use "
                    "decode_mode='rgb' for this source"
                )
            cs_tag = 1 if cs == 709 else 0  # tag-byte bit 0, see make_extract_step
        clips = []
        for ci, s in enumerate(starts):
            if decode_mode == "yuv":
                y, u, v, full = vr.read_strided_yuv(s, p.num_frames, p.clip_stride)
                if y.shape[-2:] != tuple(decode_hw):
                    raise RuntimeError(
                        f"{uri}: native size {y.shape[-2:]} != decode_hw {decode_hw} — "
                        "yuv mode reads at native resolution; pass matching decode_hw "
                        "or use decode_mode='rgb' (which rescales)"
                    )
                t = y.shape[0]
                # Trailing tag byte (bitmask): bit 0 = BT.709-tagged, bit 1 =
                # full-range (yuvj/pc). Rides the packed row so batches can mix
                # videos with different colorimetry without changing the
                # (clips, refs, counts) batch interface.
                tag = np.full((t, 1), cs_tag | (2 if full else 0), np.uint8)
                packed = np.concatenate(
                    [y.reshape(t, -1), u.reshape(t, -1), v.reshape(t, -1), tag], axis=1
                )
                clips.append((ClipRef(vi, ci), packed))
            else:
                clips.append((ClipRef(vi, ci), vr.read_strided(s, p.num_frames, p.clip_stride)))
        vr.close()
        return vi, clips

    # Completion-order draining with a bounded look-ahead window: a slow video never
    # head-of-line-blocks the device (pool.map would yield in submit order), and at most
    # ``window`` decoded videos are buffered (bounds host RAM). This is the DALI decode
    # thread pool's role, host-side.
    pool = ThreadPoolExecutor(num_workers)
    window = max(2 * num_workers, 4)
    state = {"next": 0}
    futures = set()
    vi_of: dict[Any, int] = {}

    def submit_next() -> None:
        if state["next"] < len(video_uris):
            f = pool.submit(decode_video, state["next"])
            vi_of[f] = state["next"]
            futures.add(f)
            state["next"] += 1

    for _ in range(min(window, len(video_uris))):
        submit_next()

    buf_clips: list[Any] = []
    buf_refs: list[ClipRef] = []
    try:
        while futures:
            done, futures = wait(futures, return_when=FIRST_COMPLETED)
            for fut in done:
                # Pop immediately: retaining the future would pin its result tuple
                # (every decoded clip of the video) in host RAM for the rest of the run.
                fut_vi = vi_of.pop(fut, -1)
                try:
                    vi, clips = fut.result()
                except Exception as e:  # noqa: BLE001 — per-video tolerance, see docstring
                    if on_error is None:
                        raise
                    on_error(fut_vi, repr(e))
                    submit_next()
                    continue
                clip_counts[vi] = len(clips)
                for ref, clip in clips:
                    buf_refs.append(ref)
                    buf_clips.append(clip)
                    if len(buf_clips) == batch_size:
                        yield np.stack(buf_clips), list(buf_refs), dict(clip_counts)
                        buf_clips, buf_refs = [], []
                submit_next()
        if buf_clips:
            refs = list(buf_refs)
            while len(buf_clips) < batch_size:
                buf_clips.append(buf_clips[-1])
            yield np.stack(buf_clips), refs, dict(clip_counts)
    finally:
        # Runs on normal exhaustion, on a decode error, AND on GeneratorExit when
        # the consumer abandons the generator mid-run (e.g. its loop body raised):
        # without this, up to ``window`` queued decodes keep running on non-daemon
        # threads that concurrent.futures joins at process exit — minutes of
        # pointless decode after the real error.
        pool.shutdown(wait=False, cancel_futures=True)


def _make_preprocess(p: FeatureExtractionParams, use_pallas: bool, yuv: bool,
                     yuv_hw: tuple[int, int]) -> Callable:
    """The device preprocess (uint8 clips -> normalized f32 frames), shared by the
    fused extract step and the quantization calibration step so the calibrated fa
    sees byte-identical inputs to the serving program. Selection mirrors the
    reference's val transform (dali_extraction.py:38-50) + this repo's ingest modes."""

    def preprocess(clips_u8):
        if yuv:
            from ted_spad_tpu.ops.yuv import fused_preprocess_yuv

            h, w = yuv_hw
            b, t = clips_u8.shape[0], clips_u8.shape[1]
            yb, cb = h * w, (h // 2) * (w // 2)
            # Two packed layouts (static shape -> trace-time branch): yb+2*cb plain
            # planes (BT.601 limited only), or +1 trailing tag byte per row — a
            # bitmask (bit 0 = BT.709 matrix, bit 1 = full range) selecting the
            # conversion coefficients per clip on device.
            if clips_u8.shape[-1] == yb + 2 * cb:
                bt709 = full_rows = None
            elif clips_u8.shape[-1] == yb + 2 * cb + 1:
                tag = clips_u8[:, 0, -1]
                bt709 = (tag & 1) > 0  # (B,) per-clip flags
                full_rows = (tag & 2) > 0
            else:
                raise ValueError(
                    f"packed yuv row is {clips_u8.shape[-1]} bytes; expected "
                    f"{yb + 2 * cb} (plain) or {yb + 2 * cb + 1} (+tag byte) for {yuv_hw}"
                )
            y_u8 = clips_u8[..., :yb].reshape(b, t, h, w)
            u_u8 = clips_u8[..., yb : yb + cb].reshape(b, t, h // 2, w // 2)
            v_u8 = clips_u8[..., yb + cb : yb + 2 * cb].reshape(b, t, h // 2, w // 2)
            return fused_preprocess_yuv(
                y_u8, u_u8, v_u8, out_h=p.reso_h, out_w=p.reso_w,
                cropping_factor=p.cropping_factor,
                out_dtype=jnp.dtype(p.compute_dtype),
                bt709=bt709, full=full_rows,
            ).astype(jnp.float32)
        if use_pallas and not p.no_ar_distortion:
            from ted_spad_tpu.ops.pallas_preprocess import fused_preprocess

            return fused_preprocess(
                clips_u8, out_h=p.reso_h, out_w=p.reso_w,
                cropping_factor=p.cropping_factor,
                out_dtype=jnp.dtype(p.compute_dtype),
            ).astype(jnp.float32)
        if p.ncrops > 1:
            # TTA fan-out: (B, T, H, W, 3) -> (B, ncrops, T, reso, reso, 3); the crop
            # axis rides as a leading dim through fa and is folded into batch for ft.
            return multi_crop_resize(
                clips_u8, p.cropping_factor, p.reso_h, p.reso_w, p.ncrops
            ).astype(jnp.float32)
        img = clips_u8.astype(jnp.float32) / 255.0
        return center_crop_resize(img, p.cropping_factor, p.reso_h, p.reso_w,
                                  no_ar_distortion=p.no_ar_distortion)

    return preprocess


def make_fa_calibration_step(
    p: FeatureExtractionParams, fa_model, use_pallas: bool | None = None,
    yuv: bool = False, yuv_hw: tuple[int, int] = (240, 320),
    ft_model=None,
) -> Callable:
    """One jitted program: the extraction preprocess + the quantization calibration
    forward(s). ``(fa_vars[, ft_vars], clips_u8) -> {site: absmax f32 scalar}`` —
    callers max-reduce across batches and feed ``act_scales_from_absmax`` to build
    the int8 serving scales.

    With ``ft_model`` (a standard WrapperI3D) the chain continues through the ft
    feature path exactly as extraction runs it (fa output, s2d-bridged, into the
    i3d stem — ops/quant_i3d.calibrate_i3d), returning fa and ft stats merged
    (``i3d_``-prefixed sites are ft's)."""
    from ted_spad_tpu.ops.quant_unetpp import calibrate_unetpp

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if p.ncrops > 1:
        use_pallas = False
    preprocess = _make_preprocess(p, use_pallas, yuv, yuv_hw)

    if ft_model is None:

        @jax.jit
        def calib(fa_vars, clips_u8):
            img = preprocess(clips_u8)
            frames = img.reshape((-1,) + img.shape[-3:])
            _, stats = calibrate_unetpp(fa_vars, frames, dtype=fa_model.dtype)
            return stats

        return calib

    from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2
    from ted_spad_tpu.ops.quant_i3d import calibrate_i3d

    @jax.jit
    def calib_both(fa_vars, ft_vars, clips_u8):
        img = preprocess(clips_u8)
        frames = img.reshape((-1,) + img.shape[-3:])
        anon, stats = calibrate_unetpp(fa_vars, frames, dtype=fa_model.dtype)
        # (lead..., T, h, w, 3) clips for ft, s2d-bridged like the serving program
        # (a pure layout permutation — per-tensor absmaxes are bridge-invariant).
        clips = anon.reshape((-1, img.shape[-4]) + anon.shape[-3:])
        _, ft_stats = calibrate_i3d(ft_model, ft_vars, space_to_depth_2x2(clips),
                                    input_s2d=True)
        assert not set(stats) & set(ft_stats), "fa/ft site collision"
        return {**stats, **ft_stats}

    return calib_both


def make_extract_step(
    ft_model, p: FeatureExtractionParams, fa=None, use_pallas: bool | None = None, mesh=None,
    yuv: bool = False, yuv_hw: tuple[int, int] = (240, 320),
    quant_act_scales: dict[str, float] | None = None,
) -> Callable:
    """One fused program: /255 + center-crop + resize + (frozen fa) + ft features.

    ``use_pallas`` selects the Pallas matmul-resample preprocessing kernel
    (ops/pallas_preprocess.py) — default on TPU backends, XLA path elsewhere.
    ``yuv``: the step takes ONE packed (B, T, H*W*3//2 [+1 tag byte]) uint8
    [Y|U|V|tag] buffer per batch (decode_mode='yuv', plane size from ``yuv_hw``) and
    fuses chroma upsample + YCbCr->RGB into the preprocess (ops/yuv.py) — half the
    host->device bytes of RGB24 in a single contiguous transfer. The optional tag
    byte is a bitmask selecting the conversion per clip row: bit 0 = BT.709 matrix
    (clear = BT.601), bit 1 = full-range transfer (clear = limited/studio).
    ``mesh``: a 1-D ``jax.sharding.Mesh`` to shard the clip batch over local chips
    (params replicated) — the DataParallel replacement (dali_extraction.py:128-133).
    ``quant_act_scales``: calibrated per-site activation scales (from
    ``make_fa_calibration_step`` + ``act_scales_from_absmax``) — switches fa to the
    opt-in int8 W8A8 serving path (ops/quant_unetpp.py)."""
    if yuv and p.no_ar_distortion:
        # Guarded here (not only in extract_features) so direct callers — bench.py,
        # tests — cannot silently get aspect-distorted output from the yuv branch.
        raise ValueError("yuv mode does not support no_ar_distortion; use rgb")
    if p.ncrops not in (1, 5, 10):
        raise ValueError(f"ncrops must be 1, 5 or 10, got {p.ncrops}")
    if p.ncrops > 1 and (yuv or p.quirk_compat or p.no_ar_distortion):
        raise ValueError(
            "ncrops > 1 (multi-crop TTA) supports only the plain rgb path — "
            "not yuv ingest, quirk_compat, or no_ar_distortion"
        )
    if use_pallas is None:
        # Mosaic kernel lowers on TPU only ('axon' = tunneled TPU); GPU/CPU take the
        # XLA path — `!= "cpu"` would crash GPU backends on the pltpu BlockSpecs.
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if p.ncrops > 1:
        use_pallas = False  # crop fan-out runs the XLA preprocess path

    shardings = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        shardings = dict(
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P(axis)),
            ),
            out_shardings=NamedSharding(mesh, P(axis)),
        )

    preprocess = _make_preprocess(p, use_pallas, yuv, yuv_hw)

    # fa variables are a jit ARGUMENT (not a closure capture): captured arrays would
    # be baked into the jaxpr/executable as constants — slower traces, a duplicate
    # copy of the whole fa checkpoint in device memory, and no sharding control.
    @functools.partial(jax.jit, **shardings)
    def extract(ft_vars, fa_vars_in, clips_u8):
        img = preprocess(clips_u8)

        def run_ft(x, **kw):
            # Flatten any TTA crop axis into ft's batch, then restore it on the
            # features: (..., T, h, w, c) -> (prod(lead), T, h, w, c) -> (..., 2048).
            lead_ft = x.shape[:-4]
            feats = ft_extract(ft_vars, x.reshape((-1,) + x.shape[-4:]), train=False, **kw)
            return feats.reshape(lead_ft + feats.shape[1:])

        if fa is not None:
            lead = img.shape[:-3]
            frames = img.reshape((-1,) + img.shape[-3:])
            # Bridged mode: fa's head emits the 2x2 space-to-depth layout that the
            # I3Res50 fast stem consumes, so no transpose sits between the models.
            # quirk_compat disables it — the scrambled return layout needs plain frames.
            bridged = (
                not p.quirk_compat
                and getattr(fa_apply, "supports_s2d", False)
                and getattr(ft_extract, "supports_s2d", False)
                and p.reso_h % 16 == 0
                and p.reso_w % 16 == 0
            )
            anon = fa_apply(fa_vars_in, frames, train=False, emit_s2d=bridged)
            if p.quirk_compat:
                # Reference extraction quirk (dali_extraction.py:168-173): fa ran on
                # clean frames (as here), but the return reshape reinterprets the
                # (B, T, C) memory as (B, C, T) before ft.
                from ted_spad_tpu.ops.temporal import extraction_return_scramble_jnp

                b_lead = int(np.prod(lead[:-1])) if len(lead) > 1 else 1
                scrambled = extraction_return_scramble_jnp(anon, b_lead, lead[-1])
                img = scrambled.reshape(lead + scrambled.shape[-3:])
            else:
                img = anon.reshape(lead + anon.shape[-3:])
            if bridged:
                return run_ft(img, input_s2d=True)
        return run_ft(img)

    fa_apply, fa_vars_c = None, None
    if fa is not None:
        fa_model, fa_vars_c = fa
        if quant_act_scales is not None:
            # Opt-in W8A8 int8 serving path (ops/quant_unetpp.py) with scales from
            # make_fa_calibration_step — int8 MXU convs at ~1.6-1.8x the bf16 rate.
            from ted_spad_tpu.ops.quant_unetpp import make_quant_fa_apply

            fa_apply = make_quant_fa_apply(fa_model, fa_vars_c, quant_act_scales)
        else:
            from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

            # Fused UNet++ decoder (up2+conv folded into lhs-dilated convs) — ~1.5x fa
            # speedup on v5e; exact module fallback for other archs / odd sizes.
            fa_apply = make_fast_fa_apply(fa_model, fa_vars_c)
    if quant_act_scales is not None and "i3d_in" in quant_act_scales:
        # ft sites present in the calibrated scales -> the ft feature path runs
        # quantized too (ops/quant_i3d.py).
        from ted_spad_tpu.ops.quant_i3d import make_quant_ft_extract

        ft_extract = make_quant_ft_extract(ft_model, quant_act_scales)
    else:
        from ted_spad_tpu.ops.fast_i3d import make_fast_ft_extract

        # s2d fast stem for I3Res50 (the profiled extraction hotspot); module
        # fallback for other ft architectures.
        ft_extract = make_fast_ft_extract(ft_model)

    # Public signature stays (ft_vars, clips_u8); the wrapper threads the fa
    # variables through as a device argument ({} when extraction runs raw).
    fa_arg = fa_vars_c if fa is not None else {}
    return lambda ft_vars, clips_u8: extract(ft_vars, fa_arg, clips_u8)


def extract_features(
    p: FeatureExtractionParams,
    video_uris: Sequence[str],
    save_dir: str,
    *,
    fa_variables: Any | None = None,
    ft_variables: Any | None = None,
    batch_size: int | None = None,
    decode_hw: tuple[int, int] = (240, 320),
    shard_id: int = 0,
    num_shards: int = 1,
    mesh=None,
    decode_mode: str = "rgb",
    num_workers: int = 8,
    log_fn: Callable[[str], None] = print,
) -> dict[str, Any]:
    """Stage driver. Returns {video_uri: saved_path} plus throughput stats and a
    ``skipped`` map of {video_uri: error} for videos whose decode failed (the run
    continues past corrupt files, like the reference's None-filter tolerance,
    ucf101_dl.py:143-146 — real UCF-Crime contains broken videos).

    ``decode_mode='yuv'``: planar ingest — host ships YUV420 planes (1.5 bytes/px) and
    the device preprocess does chroma upsample + YCbCr->RGB (ops/yuv.py; BT.601 and
    BT.709 tags both honored, selected per clip row).
    ``num_workers``: host decode threads; this is the throughput knob when extraction
    is decode-bound (each software-decode thread needs roughly one host core).
    Sharding: shard ``video_uris`` round-robin per process (DALI num_shards/shard_id
    equivalent, dali_extraction.py:63-64). Resume: existing ``.npy`` skipped (:121)."""
    if decode_mode == "yuv" and p.no_ar_distortion:
        raise ValueError("decode_mode='yuv' does not support no_ar_distortion; use 'rgb'")
    os.makedirs(save_dir, exist_ok=True)

    # uri-hash dedup over the FULL list before sharding (utils/naming.py) — same-
    # basename videos in different dirs must not clobber, including across shards.
    from ted_spad_tpu.utils.naming import dedup_names

    names = dedup_names(list(video_uris))

    def out_path(uri: str) -> str:
        return os.path.join(save_dir, names[uri] + ".npy")

    uris = [u for i, u in enumerate(video_uris) if i % num_shards == shard_id]
    # Resume-by-skip (dali_extraction.py:121): already-extracted artifacts are
    # reported in ``existing`` so callers (e.g. run_parity) can keep list/gt
    # alignment across resumed runs.
    existing = {u: out_path(u) for u in uris if os.path.exists(out_path(u))}
    uris = [u for u in uris if u not in existing]
    if not uris:
        return {"saved": {}, "existing": existing, "skipped": {}, "clips": 0,
                "elapsed_s": 0.0, "clips_per_sec": 0.0}

    fa = None
    if p.anonymized:
        fa_model, fa_vars = load_fa_model(
            p.saved_model_fa, arch=p.arch_fa, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype
        )
        if fa_variables is not None:
            fa_vars = fa_variables
        fa = (fa_model, fa_vars)
    ft_model, ft_vars = load_ft_model(
        p.arch_ft, p.saved_model_ft, num_classes=p.num_classes,
        clip_shape=(p.num_frames, p.reso_h, p.reso_w), dtype=p.compute_dtype,
    )
    if ft_variables is not None:
        ft_vars = ft_variables
    if p.quant not in ("none", "int8"):
        raise ValueError(f"quant must be 'none' or 'int8', got {p.quant!r}")
    if p.quant == "int8" and fa is None:
        raise ValueError("quant='int8' quantizes the fa anonymizer — requires anonymized=True")

    bs = batch_size or max(p.batch_size, 1)
    acc: dict[int, dict[int, np.ndarray]] = {}
    counts: dict[int, int] = {}
    saved: dict[str, str] = {}
    n_clips = 0
    t0 = time.time()
    inflight: list[tuple[Any, list[ClipRef]]] = []

    def flush_ready() -> None:
        """Write out every fully-accumulated video. ATOMIC: np.save goes to a temp
        name and os.replace()s into place — resume-by-skip trusts bare existence of
        out_path, so a run killed mid-write must never leave a truncated .npy that
        all future runs silently skip as 'existing'."""
        for vi in list(acc):
            if vi in counts and len(acc[vi]) == counts[vi]:
                feat = np.stack([acc[vi][c] for c in range(counts[vi])])
                path = out_path(uris[vi])
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:  # file handle: np.save can't append a suffix
                    np.save(f, feat)
                os.replace(tmp, path)
                saved[uris[vi]] = path
                del acc[vi]

    def drain(entry):
        nonlocal n_clips
        feats, refs = entry
        feats = np.asarray(feats)  # blocks; device already moved on to the next batch
        for row, ref in enumerate(refs):
            acc.setdefault(ref.video_idx, {})[ref.clip_idx] = feats[row]
            n_clips += 1
        flush_ready()

    skipped: dict[str, str] = {}

    def record_skip(vi: int, err: str) -> None:
        uri = uris[vi] if 0 <= vi < len(uris) else f"<video #{vi}>"
        skipped[uri] = err
        log_fn(f"WARNING: skipping undecodable video {uri}: {err}")

    batch_iter = iter_clip_batches(
        uris, p, bs, decode_hw=decode_hw, decode_mode=decode_mode,
        num_workers=num_workers, on_error=record_skip,
    )

    quant_scales = None
    quant_stats: dict[str, Any] = {}
    if p.quant == "int8":
        # Calibrate on the run's own leading batches (they are representative by
        # construction — same decode, same preprocess), then chain them back so
        # they are extracted normally: calibration costs decode nothing.
        import itertools

        from ted_spad_tpu.ops.quant_unetpp import act_scales_from_absmax

        fa_model, fa_vars = fa
        ft_quant_model = None
        if p.quant_ft:
            from ted_spad_tpu.models.i3res50 import WrapperI3D

            if isinstance(ft_model, WrapperI3D) and not ft_model.use_nl:
                ft_quant_model = ft_model
            else:
                log_fn("quant int8: ft is not a standard WrapperI3D — "
                       "quantizing fa only")
        calib = make_fa_calibration_step(
            p, fa_model, yuv=decode_mode == "yuv", yuv_hw=decode_hw,
            ft_model=ft_quant_model,
        )
        head_batches = []
        absmax: dict[str, float] = {}
        for _ in range(max(1, p.quant_calib_batches)):
            try:
                b = next(batch_iter)
            except StopIteration:
                break
            head_batches.append(b)
            if ft_quant_model is not None:
                stats = calib(fa_vars, ft_vars, jnp.asarray(b[0]))
            else:
                stats = calib(fa_vars, jnp.asarray(b[0]))
            for k, v in stats.items():
                absmax[k] = max(absmax.get(k, 0.0), float(v))
        if not head_batches:
            log_fn("WARNING: no decodable batches to calibrate on; nothing to extract")
            return {"saved": {}, "existing": existing, "skipped": skipped, "clips": 0,
                    "elapsed_s": 0.0, "clips_per_sec": 0.0}
        quant_scales = act_scales_from_absmax(absmax)
        quant_stats["quant_calib_batches_used"] = len(head_batches)
        batch_iter = itertools.chain(head_batches, batch_iter)

    extract = make_extract_step(
        ft_model, p, fa, mesh=mesh, yuv=decode_mode == "yuv", yuv_hw=decode_hw,
        quant_act_scales=quant_scales,
    )

    if quant_scales is not None and p.quant_fidelity_check:
        # Feature-level fidelity vs the bf16 path on the first calibration batch —
        # logged and returned so every quantized run carries its own evidence.
        ref_step = make_extract_step(
            ft_model, p, fa, mesh=mesh, yuv=decode_mode == "yuv", yuv_hw=decode_hw
        )
        b0 = jnp.asarray(head_batches[0][0])
        fq = np.asarray(extract(ft_vars, b0))
        fq = fq.reshape(-1, fq.shape[-1])  # (clips[*ncrops], feat_dim)
        fr = np.asarray(ref_step(ft_vars, b0)).reshape(fq.shape)
        num = (fq * fr).sum(-1)
        den = np.linalg.norm(fq, axis=-1) * np.linalg.norm(fr, axis=-1)
        cos = float(np.mean(num / np.maximum(den, 1e-12)))
        quant_stats["quant_feature_cossim_vs_bf16"] = round(cos, 5)
        log_fn(f"quant int8: feature cosine similarity vs bf16 on calibration batch: {cos:.5f}")
        del ref_step

    for clips, refs, clip_counts in batch_iter:
        counts.update(clip_counts)
        # Async dispatch: enqueue this batch, then drain the previous one while the
        # device works (double buffering through the JAX dispatch queue).
        feats = extract(ft_vars, jnp.asarray(clips))
        inflight.append((feats, refs))
        if len(inflight) > 1:
            drain(inflight.pop(0))
    while inflight:
        drain(inflight.pop(0))
    flush_ready()  # defensive: every count arrives with (or before) its last clips

    elapsed = time.time() - t0
    log_fn(f"extracted {n_clips} clips from {len(saved)} videos in {elapsed:.1f}s "
           f"({n_clips / max(elapsed, 1e-9):.2f} clips/s)"
           + (f"; skipped {len(skipped)} undecodable" if skipped else ""))
    return {"saved": saved, "existing": existing, "skipped": skipped, "clips": n_clips,
            "elapsed_s": elapsed, "clips_per_sec": n_clips / max(elapsed, 1e-9),
            **quant_stats}
