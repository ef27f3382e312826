"""Benchmark: feature-extraction throughput (clips/sec/chip) — the north-star metric
(BASELINE.json: "clips/sec/chip feature extraction").

Measures the fused extraction program (Pallas preprocess + fused UNet++ fa + I3Res50
features, bf16) streaming batched clips — the stages/feature_extraction.py hot path —
on whatever device is available (real TPU chip under the driver; CPU in dev).

Structure (round-4 redesign after r3 shipped rc=124 with zero output): the bench runs
inside a HARD total envelope (``BENCH_TIMEOUT_S``, default 1200 s measured from
process start; 0 disables). The headline record is held in a module-level RESULT that
every section updates as it completes, and the single JSON line is emitted exactly
once — at the end, from the watchdog (PARTIAL results measured so far, not a value-0
failure record), or from the crash handler. Every section after the headline is
gated on remaining budget and individually try/excepted, so an overrun or failure
costs that section only, never the artifact. Progress lines go to stderr (the
driver's tail) — stdout carries exactly one JSON line.

Timing methodology: on the tunneled TPU backend ``block_until_ready`` does NOT wait
for remote execution, so wall-clock loops measure dispatch, not compute. We time K vs
2K iterations of a ``lax.fori_loop`` whose body is data-chained through a
NaN-guarded carry (XLA cannot hoist or DCE it) with a full-output reduction, force
the scalar with ``np.asarray``, and difference the two runs to cancel the tunnel
round trip. This is honest device time. The trip count is a TRACED argument (one
compile serves both K and 2K — compiles are client-side on a 1-core host, so each
static-K pair was doubling every section's compile bill).

``vs_baseline``: the reference pipeline processes ONE clip per step with decode, fa
and ft as separate f32 kernels (dali_extraction.py, params_feature_ex.py:4
batch_size=1, :168-179). We time the same-device equivalent (batch=1, f32, module fa,
XLA preprocess) with the same methodology and report fused-batched/batch1 — the
measured speedup of the TPU-first design over a faithful port on identical hardware.
``detail.mfu`` (XLA cost analysis FLOPs / generation peak) is the across-round-stable
companion number — the vs_baseline denominator improves as shared infra improves.

``detail.decode_workers_sweep``: decode-only clips/s over the UNIQUE realistic
fixture set (ted_spad_tpu/utils/bench_videos.py: 32 distinct H.264 scenes, mixed
240/480p, incl. 1000+ frame files — replaces r3's 8 cache-hot gradient clips), plus
``host_cores`` — software decode scales with host cores, so the per-chip feeding
budget is ``decode_clips_per_sec_per_core x cores``.

``detail.adversarial_*_ms`` / ``action_train_step_ms`` / ``privacy_train_step_ms`` /
``recon_train_step_ms`` / ``mgfn_train_step_ms``: honest device time for every
stage's training hot loop (train_anonymizer.py:32-197; train_action.py:28-105;
train_privacy.py:29-68; train_reconstruction.py:26-59; anomaly_detection_mgfn/
train.py:79-108) at reference shapes. ``adversarial_fa_step_b8_remat_{on,blocks}_ms``
times the fa step at the full reference batch (8 videos + 12 VISPR pairs, where
remat is mandatory) under full vs block-boundary rematerialization.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = int(os.environ.get("BENCH_TIMEOUT_S", "1200"))
# BENCH_SMOKE=1: tiny models + tiny shapes, headline+MFU only — exercises the full
# emission contract (one JSON line, value>0, watchdog/partial paths) in seconds on
# CPU so tests/test_driver_gates.py can rehearse the gate without TPU-scale compute.
SMOKE = os.environ.get("BENCH_SMOKE") == "1"

RESULT = {
    "metric": "feature_extraction_clips_per_sec_per_chip",
    "value": 0.0,
    "unit": "clips/s",
    "vs_baseline": 0.0,
    "detail": {},
}
DETAIL = RESULT["detail"]

_EMIT_LOCK = threading.Lock()
_EMITTED = [False]


def elapsed() -> float:
    return time.perf_counter() - T_START


def remaining() -> float:
    return float("inf") if BUDGET_S <= 0 else BUDGET_S - elapsed()


def note(msg: str) -> None:
    print(f"[bench {elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def emit() -> bool:
    """Print the single JSON record (once). Returns True if this call emitted.

    The record is serialized from a SNAPSHOT of RESULT/DETAIL and the line is fully
    built BEFORE the emitted flag is claimed: the watchdog calls this from a timer
    thread while main() may still be mutating DETAIL, and a 'dict changed size
    during iteration' inside json.dumps after claiming the flag would suppress
    emission forever (ADVICE r4) — the exact empty-stdout failure this file exists
    to prevent."""
    for _ in range(3):
        try:
            detail = dict(DETAIL)
            break
        except RuntimeError:  # resized mid-copy by the main thread
            continue
    else:
        detail = {"snapshot_error": "detail mutated during emit"}
    detail["bench_wall_s"] = round(elapsed(), 1)
    line = json.dumps({**RESULT, "detail": detail})
    with _EMIT_LOCK:
        if _EMITTED[0]:
            return False
        _EMITTED[0] = True
    print(line, flush=True)
    return True


def section(name: str, est_s: float) -> bool:
    """Budget gate: run the section only if the remaining envelope can afford its
    estimated cost. A skipped section is recorded in detail so the artifact says
    what was dropped instead of silently narrowing coverage."""
    if SMOKE and name != "mfu":
        DETAIL[f"skipped_{name}"] = "smoke mode"
        return False
    if remaining() >= est_s:
        note(f"section {name} (est {est_s:.0f}s, {remaining():.0f}s left)")
        return True
    DETAIL[f"skipped_{name}"] = f"budget: {remaining():.0f}s left < est {est_s:.0f}s"
    note(f"SKIP section {name}: {DETAIL[f'skipped_{name}']}")
    return False


def tree_sum(t):
    """f32 sum over a pytree's array leaves — timing wrappers return this over the
    UPDATED params so XLA cannot dead-code the optimizer update inside the loop."""
    import jax
    import jax.numpy as jnp

    return sum(
        x.astype(jnp.float32).sum()
        for x in jax.tree_util.tree_leaves(t)
        if hasattr(x, "dtype")
    )


def _load_block_anatomy(device_kind: str, batch: int) -> dict | None:
    """Load the committed per-segment anatomy (scripts/bench_blocks.py) if it
    matches this device generation + batch; None -> caller falls back to the
    estimate. The artifact is measured once per hardware/rewrite change, not
    per bench run (isolated-segment compiles don't fit the bench envelope)."""
    path = os.path.join("hw_checklist", "block_anatomy.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        if rec.get("batch") != batch or not rec.get("mfu_ceiling_computed"):
            return None
        if rec.get("device_kind", "").lower() not in device_kind:
            return None
        rec["_path"] = path
        return rec
    except (OSError, ValueError):
        return None


def device_ms_per_call(fn, args, iters: int) -> float:
    """Honest per-call device ms for fn(*args) (tunnel-RTT-cancelled). The loop trip
    count is a traced argument: ONE compile covers the K and 2K runs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(k, *a):
        def body(_, acc):
            # Runtime-zero uint8 the compiler can't prove is zero: defeats
            # loop-invariant hoisting without touching the data.
            eps = jnp.where(jnp.isnan(acc), jnp.uint8(1), jnp.uint8(0))
            chained = tuple(
                x + eps.astype(x.dtype) if hasattr(x, "dtype") else x for x in a
            )
            out = fn(*chained)
            return acc + out.astype(jnp.float32).sum() * 0.0

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    k1 = jnp.int32(iters)
    k2 = jnp.int32(2 * iters)
    np.asarray(loop(k1, *args)), np.asarray(loop(k2, *args))  # compile + warm

    def run(k):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(k, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max(run(k2) - run(k1), 1e-9) / iters * 1e3


def main() -> None:
    if os.environ.get("BENCH_FAULT_INJECT") == "init":
        # Test-only hook (tests/test_driver_gates.py): deterministic pre-headline
        # failure, standing in for a dead backend/tunnel. Must produce the value-0
        # failure record and rc=1 through the crash handler.
        raise RuntimeError("injected init failure (BENCH_FAULT_INJECT=init)")
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()  # force backend init under the short init fuse…
    # …then the measurement watchdog fires at the TOTAL envelope (from process
    # start, not re-based) — partial results beat a timeout artifact.
    _arm_watchdog(max(int(remaining()), 30) if BUDGET_S > 0 else 0, "measurement")
    note(f"backend up: {jax.devices()[0]}")
    import jax.numpy as jnp

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.feature_extraction import extract_features, make_extract_step

    if SMOKE:
        p = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32)
        fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="bfloat16", tiny=True)
        ft_model, ft_vars = load_ft_model(
            "largei3d", num_classes=4, clip_shape=(8, 32, 32), dtype="bfloat16", tiny=True
        )
        batch, nf, h, w, iters_fused, iters_ref = 2, 8, 48, 64, 2, 2
    else:
        p = FeatureExtractionParams(num_frames=16, reso_h=224, reso_w=224)
        fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
        ft_model, ft_vars = load_ft_model(
            "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
        )
        batch, nf, h, w, iters_fused, iters_ref = 16, 16, 240, 320, 8, 4

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (batch, nf, h, w, 3), dtype=np.uint8)
    clips_dev = jnp.asarray(clips)
    one_clip = jnp.asarray(clips[:1])

    # === HEADLINE (unconditional): fused+batched vs reference-style batch=1 ========
    # Fused (ours): Pallas preprocess + fused fa + ft, one program.
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))
    ms_fused = device_ms_per_call(lambda c: extract(ft_vars, c), (clips_dev,), iters=iters_fused)
    fused = batch / (ms_fused / 1e3)
    DETAIL.update(
        batched_fused_clips_per_sec=round(fused, 3),
        fused_ms_per_batch=round(ms_fused, 3),
        batch=batch,
        device=str(jax.devices()[0]),
    )
    RESULT["value"] = round(fused, 3)
    note(f"fused b{batch}: {fused:.1f} clips/s ({ms_fused:.1f} ms/batch)")

    # Reference-style: batch=1, f32, module fa, gather-based preprocess. In SMOKE the
    # comparison only exercises the emission contract, so tiny models at the smoke
    # image size keep the gate within its test envelope on a 1-core CPU host
    # (ADVICE r4: full-size f32 models here defeated the 'tiny shapes' contract).
    _tiny = {"tiny": True} if SMOKE else {}
    fa32_model, fa32_vars = load_fa_model(
        image_size=(p.reso_h, p.reso_w), dtype="float32", **_tiny
    )
    ft32_model, ft32_vars = load_ft_model(
        "largei3d", num_classes=4 if SMOKE else 102,
        clip_shape=(nf, p.reso_h, p.reso_w), dtype="float32", **_tiny
    )

    def ref_style(c):
        img = center_crop_resize(
            c.astype(jnp.float32) / 255.0, p.cropping_factor, p.reso_h, p.reso_w
        )
        frames = img.reshape((-1,) + img.shape[-3:])
        a = fa32_model.apply(fa32_vars, frames, train=False)
        img = a.reshape(img.shape[:-3] + a.shape[-3:])
        return ft32_model.apply(ft32_vars, img, train=False, method="extract_features")

    ms_ref = device_ms_per_call(ref_style, (one_clip,), iters=iters_ref)
    ref_rate = 1.0 / (ms_ref / 1e3)
    del fa32_vars, ft32_vars, ref_style  # free the f32 copies' HBM before training steps
    DETAIL["batch1_unfused_clips_per_sec"] = round(ref_rate, 3)
    RESULT["vs_baseline"] = round(fused / max(ref_rate, 1e-9), 3)
    note(f"ref b1: {ref_rate:.1f} clips/s -> vs_baseline {RESULT['vs_baseline']}")

    # === MFU of the fused extraction program (across-round-stable metric) ==========
    if section("mfu", 60):
        try:
            compiled = jax.jit(lambda c: extract(ft_vars, c)).lower(clips_dev).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops_batch = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops_batch > 0:
                flops_per_clip = flops_batch / batch
                kind = jax.devices()[0].device_kind.lower()
                # bf16 peak TFLOP/s per chip by generation (public TPU specs).
                peaks = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
                         "v6 lite": 918e12, "v6e": 918e12}
                peak = next((v for k, v in peaks.items() if k in kind), None)
                DETAIL["flops_per_clip"] = round(flops_per_clip / 1e9, 3)  # GFLOP
                if peak:
                    DETAIL["mfu"] = round(flops_per_clip * fused / peak, 4)
                    DETAIL["mfu_peak_assumed_tflops"] = peak / 1e12
                    note(f"mfu {DETAIL['mfu']} ({DETAIL['flops_per_clip']} GFLOP/clip)")
                    # Design ceiling: COMPUTED from the committed per-segment
                    # anatomy (scripts/bench_blocks.py -> hw_checklist/
                    # block_anatomy.json: every segment of this program timed in
                    # isolation with its cost-analysis FLOPs; ceiling = total
                    # FLOPs / sum of isolated segment times / peak — the program
                    # cannot beat the sum of its parts at their measured rates).
                    # Falls back to the older 0.60 estimate (per-block rooflines
                    # in COMPONENTS.md) when no anatomy artifact matches this
                    # device generation + batch.
                    anat = _load_block_anatomy(kind, batch)
                    if anat:
                        DETAIL["mfu_ceiling_computed"] = anat["mfu_ceiling_computed"]
                        DETAIL["block_anatomy_ms"] = {
                            k: v["ms"] for k, v in anat["blocks"].items()
                        }
                        DETAIL["block_anatomy_source"] = anat["_path"]
                        DETAIL["block_anatomy_unattributed_ms"] = round(
                            ms_fused - anat["sum_blocks_ms"], 2
                        )  # THIS run's fused ms minus the isolated-segment sum
                        DETAIL["mfu_of_ceiling"] = round(
                            DETAIL["mfu"] / anat["mfu_ceiling_computed"], 3
                        )
                        note(f"mfu ceiling (computed) {anat['mfu_ceiling_computed']}; "
                             f"unattributed {DETAIL['block_anatomy_unattributed_ms']} ms")
                    else:
                        DETAIL["mfu_ceiling_estimate"] = 0.60
                        DETAIL["mfu_of_ceiling"] = round(DETAIL["mfu"] / 0.60, 3)
        except Exception as e:  # noqa: BLE001 — cost analysis is backend-dependent
            DETAIL["mfu_error"] = repr(e)

    # === Larger-batch sweep: does b32 beat b16? ====================================
    if section("b32", 120):
        try:
            clips32 = jnp.asarray(
                rng.integers(0, 255, (32, 16, 240, 320, 3), dtype=np.uint8)
            )
            ms32 = device_ms_per_call(lambda c: extract(ft_vars, c), (clips32,), iters=4)
            rate32 = 32 / (ms32 / 1e3)
            DETAIL["batched_fused_b32_clips_per_sec"] = round(rate32, 3)
            DETAIL["fused_b32_ms_per_batch"] = round(ms32, 3)
            note(f"fused b32: {rate32:.1f} clips/s")
            if rate32 > fused:
                # Keep the whole record consistent with the new headline (ADVICE r4):
                # rate, batch, ms/batch, mfu AND mfu_of_ceiling all move together.
                RESULT["value"] = round(rate32, 3)
                RESULT["vs_baseline"] = round(rate32 / max(ref_rate, 1e-9), 3)
                DETAIL["batch"] = 32
                DETAIL["headline_ms_per_batch_key"] = "fused_b32_ms_per_batch"
                if "mfu" in DETAIL:
                    DETAIL["mfu"] = round(
                        DETAIL["mfu"] * rate32 / fused, 4
                    )  # same FLOPs/clip, higher rate
                    ceiling = DETAIL.get("mfu_ceiling_computed") or DETAIL.get(
                        "mfu_ceiling_estimate"
                    )
                    if ceiling:
                        DETAIL["mfu_of_ceiling"] = round(DETAIL["mfu"] / ceiling, 3)
            del clips32
        except Exception as e:  # noqa: BLE001
            DETAIL["b32_error"] = repr(e)

    # === Opt-in int8 W8A8 serving mode (ops/quant_unetpp.py) =======================
    # The same fused extraction program with fa's convs on the int8 MXU path
    # (394 TOPS vs 197 TFLOP/s bf16 on v5e), activation scales calibrated on this
    # run's own clips. Recorded as DETAIL (not the headline): it changes numerics
    # at int8 resolution, so it ships with its feature-level fidelity vs the bf16
    # path on the same clips. extraction --quant int8 is the user-facing switch.
    if section("quant_int8", 240):
        try:
            from ted_spad_tpu.ops.quant_unetpp import act_scales_from_absmax
            from ted_spad_tpu.stages.feature_extraction import make_fa_calibration_step

            calib = make_fa_calibration_step(p, fa_model, ft_model=ft_model)
            stats = calib(fa_vars, ft_vars, clips_dev)
            scales = act_scales_from_absmax({k: float(v) for k, v in stats.items()})
            extract_q = make_extract_step(
                ft_model, p, fa=(fa_model, fa_vars), quant_act_scales=scales
            )
            ms_q = device_ms_per_call(
                lambda c: extract_q(ft_vars, c), (clips_dev,), iters=iters_fused
            )
            rate_q = batch / (ms_q / 1e3)
            DETAIL["quant_int8_clips_per_sec"] = round(rate_q, 3)
            DETAIL["quant_int8_ms_per_batch"] = round(ms_q, 3)
            DETAIL["quant_int8_vs_baseline"] = round(rate_q / max(ref_rate, 1e-9), 3)
            DETAIL["quant_int8_comparator"] = "batched_fused_clips_per_sec (b16 bf16)"
            fq = np.asarray(extract_q(ft_vars, clips_dev))
            fr = np.asarray(extract(ft_vars, clips_dev))
            fq2, fr2 = fq.reshape(-1, fq.shape[-1]), fr.reshape(-1, fq.shape[-1])
            cos = float(
                np.mean(
                    (fq2 * fr2).sum(-1)
                    / np.maximum(
                        np.linalg.norm(fq2, axis=-1) * np.linalg.norm(fr2, axis=-1), 1e-12
                    )
                )
            )
            DETAIL["quant_int8_feature_cossim_vs_bf16"] = round(cos, 5)
            note(
                f"quant int8: {rate_q:.1f} clips/s ({ms_q:.1f} ms/batch, "
                f"{rate_q / fused:.2f}x bf16), feature cossim {cos:.5f}"
            )
            del extract_q, fq, fr, fq2, fr2
        except Exception as e:  # noqa: BLE001
            DETAIL["quant_int8_error"] = repr(e)

    # === Adversarial training steps at reference shape =============================
    # fa update + fused fb/ft update (train_anonymizer.py:32-197) at B=4 videos x 3
    # views x 16 frames @ 224² bf16, VISPR pair batch 6 (half of B=8's 12).
    # remat='auto' resolves at this size per _resolve_remat — recorded in detail.
    fb_model = fb_vars = None
    if section("adversarial_b4", 240):
        try:
            from ted_spad_tpu.config.params import AnonymizationParams
            from ted_spad_tpu.models import load_fb_model
            from ted_spad_tpu.stages.anonymization_training import (
                _resolve_remat,
                make_fa_step,
                make_fbft_step,
            )
            from ted_spad_tpu.stages.common import make_optimizer

            ap = AnonymizationParams(num_frames=16, reso_h=224, reso_w=224)
            fb_model, fb_vars = load_fb_model(ssl=True, image_size=(224, 224), dtype="bfloat16")
            opt_fa = make_optimizer(ap.opt_type, ap.learning_rate_fa, ap.weight_decay)
            opt_fb = make_optimizer(ap.opt_type, ap.learning_rate_fb, ap.weight_decay)
            opt_ft = make_optimizer(ap.opt_type, ap.learning_rate_ft, ap.weight_decay)
            st_fa = opt_fa.init(fa_vars["params"])
            st_fb = opt_fb.init(fb_vars["params"])
            st_ft = opt_ft.init(ft_vars["params"])
            fa_step = make_fa_step(fa_model, fb_model, ft_model, opt_fa, ap)
            fbft_step = make_fbft_step(fa_model, fb_model, ft_model, opt_fb, opt_ft, ap)

            bt, vb = 4, 6
            key = jax.random.PRNGKey(0)
            tr_clips = jax.random.uniform(key, (bt, 3, 16, 224, 224, 3), jnp.bfloat16)
            va = jax.random.uniform(key, (vb, 224, 224, 3), jnp.bfloat16)
            vbb = jax.random.uniform(jax.random.PRNGKey(1), (vb, 224, 224, 3), jnp.bfloat16)
            tlabels = jnp.zeros((bt,), jnp.int32)

            # Timing wrappers return one scalar that depends on the UPDATED params
            # (tree_sum), so XLA cannot dead-code the optimizer update.
            def fa_once(v1, v2, c, lab):
                new_fa, _, lfa, *_ = fa_step(fa_vars, st_fa, fb_vars, ft_vars, key, v1, v2, c, lab)
                return tree_sum(new_fa["params"]) + lfa

            def fbft_once(v1, v2, c, lab):
                new_fb, new_ft, _, _, lfb, *_ = fbft_step(
                    fa_vars, fb_vars, ft_vars, st_fb, st_ft, key, v1, v2, c, lab
                )
                return tree_sum(new_fb["params"]) + tree_sum(new_ft["params"]) + lfb

            DETAIL["adversarial_fa_step_ms"] = round(
                device_ms_per_call(fa_once, (va, vbb, tr_clips, tlabels), iters=4), 1
            )
            note(f"fa step b4: {DETAIL['adversarial_fa_step_ms']} ms")
            DETAIL["adversarial_fbft_step_ms"] = round(
                device_ms_per_call(fbft_once, (va, vbb, tr_clips, tlabels), iters=4), 1
            )
            note(f"fbft step b4: {DETAIL['adversarial_fbft_step_ms']} ms")
            DETAIL["adversarial_batch"] = bt
            resolved = _resolve_remat(ap, tr_clips, va)
            DETAIL["adversarial_remat"] = resolved if isinstance(resolved, str) else bool(resolved)
        except Exception as e:  # noqa: BLE001
            DETAIL["adversarial_step_error"] = repr(e)

    # === Decode-inclusive end-to-end + honest decode sweep =========================
    # Before the remaining device timings: the decode story has no committed fallback
    # (VERDICT r3 #5), while the B=8 remat comparison below is also recorded in
    # COMPONENTS.md from scripts/bench_remat.py runs.
    if section("decode_e2e", 240):
        _decode_e2e(p, extract, fa_vars, ft_vars, batch, clips_dev)

    # === B=8 fa-step remat comparison (reference batch; remat mandatory) ===========
    # Shares compiled programs with scripts/bench_remat.py (identical optimizer
    # constants -> persistent-cache hits).
    if fb_vars is None:
        # adversarial_b4 was itself skipped or failed before loading fb — record WHY
        # this section can't run instead of silently narrowing coverage (ADVICE r4).
        DETAIL.setdefault(
            "skipped_remat_b8",
            DETAIL.get("skipped_adversarial_b4", "adversarial_b4 unavailable (fb model not loaded)"),
        )
    if fb_vars is not None and section("remat_b8", 300):
        try:
            from ted_spad_tpu.config.params import AnonymizationParams
            from ted_spad_tpu.stages.anonymization_training import make_fa_step
            from ted_spad_tpu.stages.common import make_optimizer

            bt8, vb8 = 8, 12  # params_anonymization.py batch sizes
            key = jax.random.PRNGKey(2)
            clips8 = jax.random.uniform(key, (bt8, 3, 16, 224, 224, 3), jnp.bfloat16)
            va8 = jax.random.uniform(jax.random.PRNGKey(3), (vb8, 224, 224, 3), jnp.bfloat16)
            vb8b = jax.random.uniform(jax.random.PRNGKey(4), (vb8, 224, 224, 3), jnp.bfloat16)
            labels8 = jnp.zeros((bt8,), jnp.int32)
            for mode in ("on", "blocks"):
                # Re-check between modes: each mode compiles a full-step loop program.
                if remaining() < 150:
                    DETAIL["remat_b8_skipped"] = f"budget before remat={mode}"
                    break
                ap8 = AnonymizationParams(num_frames=16, reso_h=224, reso_w=224, remat=mode)
                # Same optimizer constants as scripts/bench_remat.py — a different LR
                # literal is a different XLA program and a guaranteed cache miss.
                opt_fa8 = make_optimizer(ap8.opt_type, ap8.learning_rate_fa, ap8.weight_decay)
                st_fa8 = opt_fa8.init(fa_vars["params"])
                fa_step8 = make_fa_step(fa_model, fb_model, ft_model, opt_fa8, ap8)

                def fa8_once(v1, v2, c, lab, _step=fa_step8, _st=st_fa8):
                    new_fa, _, lfa, *_ = _step(
                        fa_vars, _st, fb_vars, ft_vars, key, v1, v2, c, lab
                    )
                    return tree_sum(new_fa["params"]) + lfa

                DETAIL[f"adversarial_fa_step_b8_remat_{mode}_ms"] = round(
                    device_ms_per_call(fa8_once, (va8, vb8b, clips8, labels8), iters=2), 1
                )
                note(f"fa step b8 remat={mode}: "
                     f"{DETAIL[f'adversarial_fa_step_b8_remat_{mode}_ms']} ms")
            del clips8, va8, vb8b
        except Exception as e:  # noqa: BLE001 — OOM on small-HBM parts is informative
            DETAIL["remat_b8_error"] = repr(e)

    # === Action training step ======================================================
    if section("action", 110):
        try:
            from ted_spad_tpu.config.params import ActionParams
            from ted_spad_tpu.ops.augment import sample_augment_params
            from ted_spad_tpu.stages.action_training import make_train_step
            from ted_spad_tpu.stages.common import make_optimizer as _mk_opt

            act = ActionParams(num_frames=16, reso_h=224, reso_w=224, batch_size=8)
            opt_act = _mk_opt(act.opt_type, act.learning_rate, act.weight_decay)
            st_act = opt_act.init(ft_vars["params"])
            act_step = make_train_step(ft_model, opt_act, act)
            # Raw decode-shaped uint8 clips + fused device augmentation, as in the driver.
            a_clips = jnp.asarray(
                rng.integers(0, 255, (8, 1, 16, 240, 320, 3), dtype=np.uint8)
            )
            a_labels = jnp.zeros((8,), jnp.int32)
            a_aug = sample_augment_params(
                np.random.default_rng(0), 8, 240, 320, 224, 224
            ).to_device()

            def act_once(c, lab):
                new_vars, _, loss = act_step(ft_vars, st_act, jax.random.PRNGKey(3), c, lab, a_aug)
                return tree_sum(new_vars["params"]) + loss

            DETAIL["action_train_step_ms"] = round(
                device_ms_per_call(act_once, (a_clips, a_labels), iters=4), 1
            )
            DETAIL["action_train_batch"] = 8
            note(f"action step b8: {DETAIL['action_train_step_ms']} ms")
        except Exception as e:  # noqa: BLE001
            DETAIL["action_step_error"] = repr(e)

    # === MGFN training step ========================================================
    if section("mgfn", 90):
        try:
            from ted_spad_tpu.config.params import MGFNParams
            from ted_spad_tpu.models import load_mgfn_model
            from ted_spad_tpu.stages.anomaly_detection import (
                make_optimizer as _mgfn_opt,
                make_train_step as _mgfn_factory,
            )

            mp = MGFNParams()  # UCF preset: 2048-d features, B=16+16, ncrops 10
            mgfn_model, mgfn_vars = load_mgfn_model(mp, ncrops=10)
            opt_mg = _mgfn_opt(mp)
            st_mg = opt_mg.init(mgfn_vars["params"])
            mg_step = _mgfn_factory(mgfn_model, opt_mg, mp)
            r2 = np.random.default_rng(3)
            nfeat = jnp.asarray(r2.random((16, 10, 32, 2049), np.float32))
            afeat = jnp.asarray(r2.random((16, 10, 32, 2049), np.float32))
            nlab = jnp.zeros((16,), jnp.float32)
            alab = jnp.ones((16,), jnp.float32)

            def mg_once(nf, af):
                nv, _, loss = mg_step(mgfn_vars, st_mg, jax.random.PRNGKey(5), nf, nlab, af, alab)
                return tree_sum(nv["params"]) + loss

            DETAIL["mgfn_train_step_ms"] = round(
                device_ms_per_call(mg_once, (nfeat, afeat), iters=8), 1
            )
            note(f"mgfn step: {DETAIL['mgfn_train_step_ms']} ms")
        except Exception as e:  # noqa: BLE001
            DETAIL["mgfn_step_error"] = repr(e)

    # === Privacy (fb) training step ================================================
    if section("privacy", 90):
        try:
            from ted_spad_tpu.config.params import PrivacyParams
            from ted_spad_tpu.models import load_fb_model as _load_fb
            from ted_spad_tpu.ops.augment import sample_augment_params as _sap
            from ted_spad_tpu.stages.common import make_optimizer as _mk_opt2
            from ted_spad_tpu.stages.privacy_training import make_steps as _privacy_steps

            pv = PrivacyParams()  # batch 32, 7 attrs, lr 1e-3 (params_privacy.py)
            fbp_model, fbp_vars = _load_fb(
                "r50", num_pa=pv.num_pa, ssl=False, image_size=(224, 224), dtype="bfloat16"
            )
            opt_pv = _mk_opt2("adam", pv.learning_rate)
            st_pv = opt_pv.init(fbp_vars["params"])
            pv_step, _ = _privacy_steps(fbp_model, None, opt_pv, (224, 224))
            pv_imgs = jnp.asarray(rng.integers(0, 255, (32, 256, 340, 3), dtype=np.uint8))
            pv_labels = jnp.asarray(rng.integers(0, 2, (32, pv.num_pa)).astype(np.float32))
            pv_aug = _sap(np.random.default_rng(1), 32, 256, 340, 224, 224).to_device()

            def pv_once(im, lab):
                nv, _, loss = pv_step(fbp_vars, st_pv, im, lab, pv_aug)
                return tree_sum(nv["params"]) + loss

            DETAIL["privacy_train_step_ms"] = round(
                device_ms_per_call(pv_once, (pv_imgs, pv_labels), iters=8), 1
            )
            note(f"privacy step: {DETAIL['privacy_train_step_ms']} ms")
        except Exception as e:  # noqa: BLE001
            DETAIL["privacy_step_error"] = repr(e)

    # === Reconstruction (fa pretrain) step =========================================
    if section("recon", 90):
        try:
            from ted_spad_tpu.config.params import ReconstructionParams
            from ted_spad_tpu.ops.augment import sample_augment_params as _sap
            from ted_spad_tpu.stages.common import make_optimizer as _mk_opt3
            from ted_spad_tpu.stages.fa_pretraining import make_train_step as _recon_factory

            rp = ReconstructionParams()  # batch 32, lr 1e-3 (fa_pretraining/parameters.py)
            opt_rc = _mk_opt3("adam", rp.learning_rate)
            st_rc = opt_rc.init(fa_vars["params"])
            rc_step = _recon_factory(fa_model, opt_rc, (224, 224))
            rc_imgs = jnp.asarray(rng.integers(0, 255, (32, 256, 340, 3), dtype=np.uint8))
            rc_aug = _sap(np.random.default_rng(2), 32, 256, 340, 224, 224).to_device()

            def rc_once(im):
                nv, _, loss = rc_step(fa_vars, st_rc, im, rc_aug)
                return tree_sum(nv["params"]) + loss

            DETAIL["recon_train_step_ms"] = round(
                device_ms_per_call(rc_once, (rc_imgs,), iters=8), 1
            )
            note(f"recon step: {DETAIL['recon_train_step_ms']} ms")
        except Exception as e:  # noqa: BLE001
            DETAIL["recon_step_error"] = repr(e)

    emit()


def _decode_e2e(p, extract, fa_vars, ft_vars, batch, clips_dev) -> None:
    """Decode-only sweep over the unique realistic fixture set + decode-inclusive
    end-to-end + h2d bandwidth. Best-effort: every sub-block is budget-checked."""
    import jax.numpy as jnp

    try:
        from ted_spad_tpu.data.video_reader import native_available

        if not native_available():
            DETAIL["e2e_error"] = "native videodec unavailable"
            return
        from ted_spad_tpu.stages.feature_extraction import extract_features, iter_clip_batches
        from ted_spad_tpu.utils.bench_videos import FULL_SPEC, REDUCED_SPEC, generate_fixture_set

        # Fixture set: full 32-video set if cached or affordable; reduced otherwise.
        import os as _os

        def _cached(spec):
            return _os.path.exists(
                _os.path.join(".bench_videos", "s" + "_".join(
                    f"{c}x{w}x{h}x{f}" for c, w, h, f in spec), "DONE")
            )

        # x264 encode on a 1-core host costs ~250 s for the reduced set and >15 min
        # for the full one — generation is a cached one-time cost, never spent cold
        # against the envelope unless the budget clearly affords the reduced set.
        if _cached(FULL_SPEC):
            uris = generate_fixture_set(spec=FULL_SPEC, log_fn=note)
            DETAIL["decode_fixture"] = "full32"
        elif _cached(REDUCED_SPEC) or remaining() > 450:
            uris = generate_fixture_set(spec=REDUCED_SPEC, log_fn=note)
            DETAIL["decode_fixture"] = "reduced16"
        else:
            DETAIL["skipped_decode_fixture"] = f"budget: {remaining():.0f}s left"
            return
        note(f"fixture set ready: {len(uris)} videos")

        cores = len(os.sched_getaffinity(0))
        DETAIL["host_cores"] = cores

        # Decode-only worker sweep (unique realistic files — VERDICT r3 #5). Sweep
        # points run over a STRATIFIED SUBSET (mixed 240p/480p incl. one long file)
        # so three worker counts fit the envelope; the headline decode rate is then
        # one FULL-set pass at the best worker count.
        def _stratified(us, k_each=3):
            by_res: dict[str, list[str]] = {}
            for u in us:
                by_res.setdefault(os.path.basename(u).split("_")[1], []).append(u)
            sub: list[str] = []
            for group in by_res.values():
                sub.extend(group[:k_each])
            return sub

        def _decode_pass(us, nw, pp=None, mode="rgb"):
            t0 = time.perf_counter()
            n = 0
            for _, refs, _ in iter_clip_batches(
                us, pp or p, batch, num_workers=nw, decode_mode=mode
            ):
                n += len(refs)
            return n, time.perf_counter() - t0

        sub_uris = _stratified(uris)
        sweep: dict[str, float] = {}
        best_nw, best_rate = 4, 0.0
        for nw in (4, 8, 16):
            if remaining() < 150:
                DETAIL["decode_sweep_truncated"] = f"budget before nw={nw}"
                break
            n, dt = _decode_pass(sub_uris, nw)
            rate = round(n / max(dt, 1e-9), 3)
            sweep[str(nw)] = rate
            note(f"decode nw={nw} (subset {len(sub_uris)}): {rate} clips/s")
            if rate > best_rate:
                best_nw, best_rate = nw, rate
            if nw >= 8 and rate < best_rate * 0.95 and cores <= 2:
                break  # no headroom to scale into; stop burning bench time
        if sweep:
            DETAIL["decode_workers_sweep_subset"] = sweep
        if sweep and remaining() > 180:
            n, dt = _decode_pass(uris, best_nw)
            DETAIL["decode_clips_per_sec"] = round(n / max(dt, 1e-9), 3)
            DETAIL["decode_clips_per_sec_per_core"] = round(
                DETAIL["decode_clips_per_sec"] / max(cores, 1), 3
            )
            note(f"decode full set nw={best_nw}: {DETAIL['decode_clips_per_sec']} clips/s")

        # Dataset-representative rate: UCF-Crime is predominantly 320x240 H.264, so
        # the 240p-only figure is the honest "can the host feed the chip" input.
        uris_240 = [u for u in uris if "320x240" in os.path.basename(u)]
        if uris_240 and remaining() > 120:
            try:
                n, dt = _decode_pass(uris_240, min(8, max(cores, 4)))
                DETAIL["decode_240p_clips_per_sec"] = round(n / max(dt, 1e-9), 3)
                note(f"decode 240p-only: {DETAIL['decode_240p_clips_per_sec']} clips/s")
            except Exception as e:  # noqa: BLE001
                DETAIL["decode_240p_error"] = repr(e)

        # YUV decode-only rate (skips host swscale->RGB; plane memcpy only). yuv mode
        # reads at native resolution, so it runs on the 240p files that match the
        # extraction decode_hw — mixed-resolution sets are an rgb-mode feature.
        # Fixture subset: first 8 of the 240p files. Comparator: a same-file-subset
        # rgb pass, recorded alongside so the +% is computable from this record alone
        # (VERDICT r4 weak #5: fixture-ambiguous keys).
        if uris_240 and remaining() > 110:
            try:
                n, dt = _decode_pass(uris_240[:8], min(8, max(cores, 4)), mode="yuv")
                DETAIL["decode_yuv_240p_subset8_clips_per_sec"] = round(n / max(dt, 1e-9), 3)
                note(f"decode yuv (240p subset8): "
                     f"{DETAIL['decode_yuv_240p_subset8_clips_per_sec']} clips/s")
                if remaining() > 110:
                    n, dt = _decode_pass(uris_240[:8], min(8, max(cores, 4)), mode="rgb")
                    DETAIL["decode_rgb_240p_subset8_clips_per_sec"] = round(
                        n / max(dt, 1e-9), 3
                    )  # the yuv figure's comparator: same files, same workers
            except Exception as e:  # noqa: BLE001
                DETAIL["decode_yuv_error"] = repr(e)

        # Opt-in decode_fast rate (skip h264 loop filter; not bit-exact — README
        # divergences): cheapest host decode when extraction is decode-bound.
        # Fixture: the STRATIFIED SUBSET (not the full set) — its comparator is the
        # same-subset rgb rate from the worker sweep at the same worker count,
        # recorded alongside (VERDICT r4 weak #5).
        if remaining() > 110:
            try:
                nw_fast = min(8, max(cores, 4))
                n, dt = _decode_pass(sub_uris, nw_fast, pp=p.replace(decode_fast=True))
                DETAIL["decode_fast_subset_clips_per_sec"] = round(n / max(dt, 1e-9), 3)
                if str(nw_fast) in sweep:
                    DETAIL["decode_fast_subset_comparator_rgb"] = sweep[str(nw_fast)]
                note(f"decode fast (subset): {DETAIL['decode_fast_subset_clips_per_sec']}"
                     f" clips/s (rgb comparator {DETAIL.get('decode_fast_subset_comparator_rgb')})")
            except Exception as e:  # noqa: BLE001
                DETAIL["decode_fast_error"] = repr(e)

        # Decode-inclusive end-to-end over a subset (device program already warm).
        if remaining() > 120:
            import tempfile

            sub = uris[:8]
            out_dir = tempfile.mkdtemp(prefix="bench_feats_")
            extract(ft_vars, clips_dev)  # warm (no-op if already)
            t0 = time.perf_counter()
            res = extract_features(
                p, sub, out_dir, fa_variables=fa_vars, ft_variables=ft_vars,
                batch_size=batch, num_workers=16, log_fn=lambda *_: None,
            )
            e2e_s = time.perf_counter() - t0
            DETAIL["e2e_clips_per_sec"] = round(res["clips"] / max(e2e_s, 1e-9), 3)
            DETAIL["e2e_clips"] = res["clips"]
            note(f"e2e rgb: {DETAIL['e2e_clips_per_sec']} clips/s ({res['clips']} clips)")

        if remaining() > 150:
            import tempfile

            sub = uris[:8]
            # Warm the yuv program on one video so its compile stays out of the timing.
            extract_features(
                p, sub[:1], tempfile.mkdtemp(prefix="bench_feats_yw_"), fa_variables=fa_vars,
                ft_variables=ft_vars, batch_size=batch, decode_mode="yuv",
                log_fn=lambda *_: None,
            )
            t0 = time.perf_counter()
            res_yuv = extract_features(
                p, sub, tempfile.mkdtemp(prefix="bench_feats_y_"), fa_variables=fa_vars,
                ft_variables=ft_vars, batch_size=batch, decode_mode="yuv",
                num_workers=16, log_fn=lambda *_: None,
            )
            DETAIL["e2e_yuv_clips_per_sec"] = round(
                res_yuv["clips"] / max(time.perf_counter() - t0, 1e-9), 3
            )
            note(f"e2e yuv: {DETAIL['e2e_yuv_clips_per_sec']} clips/s")

        # Host->device bandwidth: contextualizes e2e — through the dev tunnel this is
        # the e2e bottleneck; on a TPU-attached host it is not.
        buf = np.zeros((batch, 16, 240, 320, 3), np.uint8)
        jnp.asarray(buf).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(buf).reshape(-1)[:8])  # force round trip
        dt = time.perf_counter() - t0
        DETAIL["h2d_MB_per_sec"] = round(buf.nbytes / 1e6 / max(dt, 1e-9), 1)
        # Explicit bound marker (VERDICT r4 weak #6): a clip batch is ~3.7 MB/clip
        # uint8, so transfer alone caps e2e at h2d/3.7 clips/s. When that cap is
        # below the device rate, the e2e_* keys measure the TUNNEL, not the system;
        # an attached host's e2e = min(decode rate x cores, device rate).
        mbps = DETAIL["h2d_MB_per_sec"]
        clip_mb = 16 * 240 * 320 * 3 / 1e6
        transfer_cap = round(mbps / clip_mb, 1)
        DETAIL["e2e_transfer_cap_clips_per_sec"] = transfer_cap
        DETAIL["e2e_transfer_bound"] = bool(
            transfer_cap < DETAIL.get("batched_fused_clips_per_sec", float("inf"))
        )
    except Exception as e:  # noqa: BLE001 — the e2e figure is best-effort detail
        DETAIL["e2e_error"] = repr(e)


_WATCHDOG = {"timer": None}


def _print_fail_record(detail: str) -> None:
    """The driver's parse contract is exactly one JSON line per round — every
    failure path that has NO measured headline must still emit the record shape."""
    with _EMIT_LOCK:
        if _EMITTED[0]:
            return
        _EMITTED[0] = True
    print(
        json.dumps(
            {
                "metric": "feature_extraction_clips_per_sec_per_chip",
                "value": 0.0,
                "unit": "clips/s",
                "vs_baseline": 0.0,
                "detail": {"fatal_error": detail},
            }
        ),
        flush=True,
    )


def _arm_watchdog(budget: int, label: str):
    """Deadman watchdog: a wedged device tunnel can hang backend init (or any remote
    dispatch) indefinitely INSIDE a C call, where neither SIGALRM handlers nor
    exceptions can run on the main thread — so a daemon timer thread emits the
    record itself and hard-exits. If the headline was already measured it emits the
    PARTIAL record (r3 lesson: a value-0 record after 20 minutes of good
    measurements forfeits the round); otherwise the failure record. Re-arming
    replaces the previous timer. 0 disables."""
    import threading as _threading

    if _WATCHDOG["timer"] is not None:
        _WATCHDOG["timer"].cancel()
        _WATCHDOG["timer"] = None
    if budget <= 0:
        return

    def _fire():
        # try/finally: os._exit MUST run no matter what emission does — a timer
        # thread that dies with the emitted flag set but no line printed leaves the
        # process running to the external SIGKILL with zero stdout (ADVICE r4).
        code = 1
        try:
            if RESULT["value"] > 0:
                DETAIL["partial"] = f"watchdog at {elapsed():.0f}s during {label}"
                if emit():
                    code = 0
            else:
                _print_fail_record(f"bench exceeded budget during {label} (hung tunnel?)")
        except BaseException as e:  # noqa: BLE001
            try:
                _print_fail_record(f"watchdog emit failed during {label}: {e!r}")
            except BaseException:  # noqa: BLE001
                pass
        finally:
            os._exit(code)

    t = _threading.Timer(budget, _fire)
    t.daemon = True
    t.start()
    _WATCHDOG["timer"] = t


if __name__ == "__main__":
    try:
        # Short fuse over backend init (tunnel-down hangs die in minutes, not the
        # full bench budget); main() re-arms the total envelope once devices respond.
        _arm_watchdog(int(os.environ.get("BENCH_INIT_TIMEOUT_S", "600")), "device init")
        main()
        _arm_watchdog(0, "done")
    except Exception as e:  # noqa: BLE001 — never exit without the JSON line
        # A crash mid-bench: emit what was measured if the headline exists,
        # else the failure record.
        if RESULT["value"] > 0:
            DETAIL["partial"] = f"exception at {elapsed():.0f}s: {e!r}"
            emit()
            raise SystemExit(0)
        _print_fail_record(repr(e))
        raise SystemExit(1)
