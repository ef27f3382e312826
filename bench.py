"""Benchmark: feature-extraction throughput (clips/sec/chip) — the north-star metric
(BASELINE.json: "clips/sec/chip feature extraction").

Measures the fused extraction program (Pallas preprocess + fused UNet++ fa + I3Res50
features, bf16) streaming batched clips — the stages/feature_extraction.py hot path —
on whatever device is available (real TPU chip under the driver; CPU in dev).

Timing methodology: on the tunneled TPU backend ``block_until_ready`` does NOT wait
for remote execution, so wall-clock loops measure dispatch, not compute. We time K vs
2K iterations of a ``lax.fori_loop`` whose body is data-chained through a
NaN-guarded carry (XLA cannot hoist or DCE it) with a full-output reduction, force
the scalar with ``np.asarray``, and difference the two runs to cancel the tunnel
round trip. This is honest device time.

``vs_baseline``: the reference pipeline processes ONE clip per step with decode, fa
and ft as separate f32 kernels (dali_extraction.py, params_feature_ex.py:4
batch_size=1, :168-179). We time the same-device equivalent (batch=1, f32, module fa,
XLA preprocess) with the same methodology and report fused-batched/batch1 — the
measured speedup of the TPU-first design over a faithful port on identical hardware.

``detail.e2e_clips_per_sec``: decode-inclusive figure — native C++ mp4 decode (host
threads) -> batch packing -> device program, over freshly written mp4 files, wall
clock. Includes host->device transfer (pessimistic under the tunnel; on a directly
attached host this approaches the device rate).

``detail.decode_workers_sweep``: decode-only clips/s at 4/8/16/32 worker threads over
32 videos, plus ``host_cores`` — software decode scales with host cores, so the
per-chip feeding budget is ``decode_clips_per_sec_per_core x cores``; the sweep
makes the core budget measurable instead of assumed (the reference never had this
problem: DALI decoded on GPU NVDEC at GPU pace, dali_extraction.py:53-81).

``detail.adversarial_fa_step_ms`` / ``adversarial_fbft_step_ms`` /
``action_train_step_ms`` (+ ``privacy_train_step_ms`` / ``recon_train_step_ms`` /
``mgfn_train_step_ms``): honest device time for every stage's training hot loop
(train_anonymizer.py:32-197; train_action.py:28-105; train_privacy.py:29-68;
train_reconstruction.py:26-59; anomaly_detection_mgfn/train.py:79-108) at reference
shapes (16 frames, 224², bf16; MGFN B=16+16 ncrops=10 f32). Remat follows the production default ``remat='auto'`` — resolved OFF
at this B=4 scale (detail.adversarial_remat records the resolved value) — so the
metric tracks what the driver actually runs, not a fixed remat configuration.
``detail.adversarial_fa_step_b8_remat_{on,blocks}_ms`` additionally times the fa
step at the full reference batch (8 videos + 12 VISPR pairs, where remat is
mandatory) under full vs block-boundary rematerialization, time-budget permitting.

``detail.mfu``: analytic-FLOP model-flops-utilization of the fused extraction
program (XLA cost analysis over the compiled HLO / assumed peak for the device
generation) — normalizes perf claims across methodology or shape changes.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


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


def device_ms_per_call(fn, args, iters: int) -> float:
    """Honest per-call device ms for fn(*args) (tunnel-RTT-cancelled)."""
    import jax
    import jax.numpy as jnp

    def make_loop(k):
        @jax.jit
        def loop(*a):
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

        return loop

    l1, l2 = make_loop(iters), make_loop(2 * iters)
    np.asarray(l1(*args)), np.asarray(l2(*args))  # compile + warm

    def run(loop):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max(run(l2) - run(l1), 1e-9) / iters * 1e3


def main() -> None:
    t_start = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()  # force backend init under the short init fuse…
    # …then give the measurement phase the full budget.
    _arm_watchdog(int(os.environ.get("BENCH_TIMEOUT_S", "3000")), "measurement")
    import jax.numpy as jnp

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.feature_extraction import extract_features, make_extract_step

    p = FeatureExtractionParams(num_frames=16, reso_h=224, reso_w=224)
    fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
    )

    batch = 16
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (batch, 16, 240, 320, 3), dtype=np.uint8)
    clips_dev = jnp.asarray(clips)
    one_clip = jnp.asarray(clips[:1])

    # --- Fused + batched (ours): Pallas preprocess + fused fa + ft, one program ----
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))
    ms_fused = device_ms_per_call(lambda c: extract(ft_vars, c), (clips_dev,), iters=8)
    fused = batch / (ms_fused / 1e3)

    # --- Reference-style: batch=1, f32, module fa, gather-based preprocess ---------
    fa32_model, fa32_vars = load_fa_model(image_size=(224, 224), dtype="float32")
    ft32_model, ft32_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="float32"
    )

    def ref_style(c):
        img = center_crop_resize(c.astype(jnp.float32) / 255.0, p.cropping_factor, 224, 224)
        frames = img.reshape((-1,) + img.shape[-3:])
        a = fa32_model.apply(fa32_vars, frames, train=False)
        img = a.reshape(img.shape[:-3] + a.shape[-3:])
        return ft32_model.apply(ft32_vars, img, train=False, method="extract_features")

    ms_ref = device_ms_per_call(ref_style, (one_clip,), iters=4)
    ref_rate = 1.0 / (ms_ref / 1e3)
    del fa32_vars, ft32_vars, ref_style  # free the f32 copies' HBM before training steps

    # --- MFU of the fused extraction program (VERDICT r3 #8) ----------------------
    detail_top: dict = {}
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
            detail_top["flops_per_clip"] = round(flops_per_clip / 1e9, 3)  # GFLOP
            if peak:
                achieved = flops_per_clip * fused
                detail_top["mfu"] = round(achieved / peak, 4)
                detail_top["mfu_peak_assumed_tflops"] = peak / 1e12
    except Exception as e:  # noqa: BLE001 — cost analysis is backend-dependent
        detail_top["mfu_error"] = repr(e)

    # --- Training-step device time at reference shape (VERDICT r3 #2) -------------
    # fa adversarial update + fused fb/ft update (train_anonymizer.py:32-197) at
    # B=4 videos x 3 views x 16 frames @ 224² bf16 (COMPONENTS.md scale), VISPR pair
    # batch 6 (half the reference's 12, matching half of B=8). remat='auto' resolves
    # OFF at this size (fits HBM; ~16% faster) — recorded in detail.
    try:
        from ted_spad_tpu.config.params import AnonymizationParams
        from ted_spad_tpu.models import load_fb_model
        from ted_spad_tpu.stages.anonymization_training import make_fa_step, make_fbft_step
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
        # (module-level tree_sum), so XLA cannot dead-code the optimizer update.
        def fa_once(v1, v2, c, lab):
            new_fa, _, lfa, *_ = fa_step(fa_vars, st_fa, fb_vars, ft_vars, key, v1, v2, c, lab)
            return tree_sum(new_fa["params"]) + lfa

        def fbft_once(v1, v2, c, lab):
            new_fb, new_ft, _, _, lfb, *_ = fbft_step(
                fa_vars, fb_vars, ft_vars, st_fb, st_ft, key, v1, v2, c, lab
            )
            return tree_sum(new_fb["params"]) + tree_sum(new_ft["params"]) + lfb

        detail_top["adversarial_fa_step_ms"] = round(
            device_ms_per_call(fa_once, (va, vbb, tr_clips, tlabels), iters=4), 1
        )
        detail_top["adversarial_fbft_step_ms"] = round(
            device_ms_per_call(fbft_once, (va, vbb, tr_clips, tlabels), iters=4), 1
        )
        detail_top["adversarial_batch"] = bt
        from ted_spad_tpu.stages.anonymization_training import _resolve_remat

        # bool for on/off; the string 'blocks' passes through as-is.
        resolved = _resolve_remat(ap, tr_clips, va)
        detail_top["adversarial_remat"] = resolved if isinstance(resolved, str) else bool(resolved)
    except Exception as e:  # noqa: BLE001
        detail_top["adversarial_step_error"] = repr(e)

    # --- B=8 fa-step remat comparison (ROADMAP hw checklist #1) -------------------
    # At the reference batch (8 videos + 12 VISPR pairs) the fa backward must
    # rematerialize ('off' OOMs a 16 GB v5e); 'blocks' keeps the fused UNet++
    # boundaries resident vs 'on' (full remat). Recorded in BENCH detail so the
    # driver's round-end run answers the pending measurement even when no
    # interactive session sees the chip; whichever mode wins should become
    # _resolve_remat's over-threshold branch. Time-guarded: skipped when the
    # sections above already consumed half the watchdog budget.
    _budget_s = int(os.environ.get("BENCH_TIMEOUT_S", "3000"))

    def _b8_budget_ok(frac: float) -> bool:
        # <= 0 means the watchdog is disabled (unlimited time) — always proceed.
        return _budget_s <= 0 or time.perf_counter() - t_start < frac * _budget_s

    if _b8_budget_ok(0.5):
        try:
            bt8, vb8 = 8, 12  # params_anonymization.py batch sizes
            clips8 = jax.random.uniform(
                jax.random.PRNGKey(2), (bt8, 3, 16, 224, 224, 3), jnp.bfloat16
            )
            va8 = jax.random.uniform(jax.random.PRNGKey(3), (vb8, 224, 224, 3), jnp.bfloat16)
            vb8b = jax.random.uniform(jax.random.PRNGKey(4), (vb8, 224, 224, 3), jnp.bfloat16)
            labels8 = jnp.zeros((bt8,), jnp.int32)
            for mode in ("on", "blocks"):
                # Re-check between modes: each mode compiles two loop programs over
                # the full adversarial step — an overrun here would let the watchdog
                # kill the bench and replace every already-measured result with the
                # value-0 failure record.
                if not _b8_budget_ok(0.7):
                    detail_top["remat_b8_skipped"] = f"time budget before remat={mode}"
                    break
                ap8 = AnonymizationParams(
                    num_frames=16, reso_h=224, reso_w=224, remat=mode
                )
                fa_step8 = make_fa_step(fa_model, fb_model, ft_model, opt_fa, ap8)

                def fa8_once(v1, v2, c, lab, _step=fa_step8):
                    new_fa, _, lfa, *_ = _step(
                        fa_vars, st_fa, fb_vars, ft_vars, key, v1, v2, c, lab
                    )
                    return tree_sum(new_fa["params"]) + lfa

                detail_top[f"adversarial_fa_step_b8_remat_{mode}_ms"] = round(
                    device_ms_per_call(fa8_once, (va8, vb8b, clips8, labels8), iters=2), 1
                )
        except Exception as e:  # noqa: BLE001 — OOM on small-HBM parts is informative
            detail_top["remat_b8_error"] = repr(e)
    else:
        detail_top["remat_b8_skipped"] = "time budget consumed by earlier sections"

    try:
        from ted_spad_tpu.config.params import ActionParams
        from ted_spad_tpu.stages.action_training import make_train_step
        from ted_spad_tpu.stages.common import make_optimizer as _mk_opt

        from ted_spad_tpu.ops.augment import sample_augment_params

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

        detail_top["action_train_step_ms"] = round(
            device_ms_per_call(act_once, (a_clips, a_labels), iters=4), 1
        )
        detail_top["action_train_batch"] = 8
    except Exception as e:  # noqa: BLE001
        detail_top["action_step_error"] = repr(e)

    # --- Remaining stage hot loops: privacy (fb), reconstruction (fa), MGFN -------
    # Together with the three metrics above this covers every training stage's
    # jitted step (train_privacy.py:29-68; train_reconstruction.py:26-59;
    # anomaly_detection_mgfn/train.py:79-108) at reference batch sizes.
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

        detail_top["privacy_train_step_ms"] = round(
            device_ms_per_call(pv_once, (pv_imgs, pv_labels), iters=8), 1
        )
    except Exception as e:  # noqa: BLE001
        detail_top["privacy_step_error"] = repr(e)

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

        detail_top["recon_train_step_ms"] = round(
            device_ms_per_call(rc_once, (rc_imgs,), iters=8), 1
        )
    except Exception as e:  # noqa: BLE001
        detail_top["recon_step_error"] = repr(e)

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

        detail_top["mgfn_train_step_ms"] = round(
            device_ms_per_call(mg_once, (nfeat, afeat), iters=8), 1
        )
    except Exception as e:  # noqa: BLE001
        detail_top["mgfn_step_error"] = repr(e)

    # --- Decode-inclusive end-to-end (native C++ decode -> device program) ---------
    detail: dict = {}
    try:
        from ted_spad_tpu.data.video_reader import native_available, write_mp4

        if native_available():
            tmp = tempfile.mkdtemp(prefix="bench_vids_")
            uris = []
            # Structured frames (moving gradients), not noise: noise is the x264
            # worst case and would benchmark the entropy coder, not the pipeline.
            yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
            for i in range(8):
                t = np.arange(256, dtype=np.float32)[:, None, None]
                plane = 127.5 + 60 * np.sin(xx / 24 + t / 7 + i) + 50 * np.cos(yy / 31 - t / 11)
                frames = np.clip(plane, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=-1)
                path = os.path.join(tmp, f"v{i}.mp4")
                write_mp4(path, frames, fps=25.0)
                uris.append(path)
            out_dir = os.path.join(tmp, "feats")
            # Warm the jit cache with one tiny run so e2e excludes compile.
            extract(ft_vars, clips_dev)
            t0 = time.perf_counter()
            res = extract_features(
                p, uris, out_dir, fa_variables=fa_vars, ft_variables=ft_vars,
                batch_size=batch, num_workers=16, log_fn=lambda *_: None,
            )
            e2e_s = time.perf_counter() - t0
            detail["e2e_clips_per_sec"] = round(res["clips"] / max(e2e_s, 1e-9), 3)
            detail["e2e_clips"] = res["clips"]

            # Planar YUV420 ingest: half the host->device bytes (the tunnel/PCIe
            # bound), color conversion fused on-device (ops/yuv.py). Warm the yuv
            # program on one video first so its jit compile stays out of the timing
            # (the rgb program was warmed by the device benchmark above).
            extract_features(
                p, uris[:1], os.path.join(tmp, "feats_yuv_warm"), fa_variables=fa_vars,
                ft_variables=ft_vars, batch_size=batch, decode_mode="yuv",
                log_fn=lambda *_: None,
            )
            t0 = time.perf_counter()
            res_yuv = extract_features(
                p, uris, os.path.join(tmp, "feats_yuv"), fa_variables=fa_vars,
                ft_variables=ft_vars, batch_size=batch, decode_mode="yuv",
                num_workers=16, log_fn=lambda *_: None,
            )
            detail["e2e_yuv_clips_per_sec"] = round(
                res_yuv["clips"] / max(time.perf_counter() - t0, 1e-9), 3
            )

            # Decode-only rate (host C++ threads, no device work): 32 videos with a
            # worker-count scaling sweep (VERDICT r3 #1). Software decode scales with
            # host cores — the sweep turns "can the host feed the chip?" into a
            # measured core budget instead of an assumption.
            from ted_spad_tpu.stages.feature_extraction import iter_clip_batches

            sweep_uris = (uris * 4)[:32]  # 32 decode jobs (each opens its own decoder)
            cores = len(os.sched_getaffinity(0))
            detail["host_cores"] = cores
            sweep: dict[str, float] = {}
            best_rate = 0.0
            for nw in (4, 8, 16, 32):
                t0 = time.perf_counter()
                n = 0
                for clips_b, refs, _ in iter_clip_batches(sweep_uris, p, batch, num_workers=nw):
                    n += len(refs)
                rate = round(n / max(time.perf_counter() - t0, 1e-9), 3)
                sweep[str(nw)] = rate
                best_rate = max(best_rate, rate)
                if nw >= 8 and rate < best_rate * 0.95 and cores <= 2:
                    break  # no headroom to scale into; stop burning bench time
            detail["decode_workers_sweep"] = sweep
            detail["decode_clips_per_sec"] = best_rate
            detail["decode_clips_per_sec_per_core"] = round(best_rate / max(cores, 1), 3)

            # YUV decode-only rate: skips the host swscale->RGB pass (plane memcpy
            # only) — the cheaper host path when extraction is decode-bound.
            t0 = time.perf_counter()
            n = 0
            for clips_b, refs, _ in iter_clip_batches(
                sweep_uris, p, batch, num_workers=min(8, max(cores, 4)), decode_mode="yuv"
            ):
                n += len(refs)
            detail["decode_yuv_clips_per_sec"] = round(n / max(time.perf_counter() - t0, 1e-9), 3)

            # Opt-in decode_fast rate (skip the h264 loop filter; not bit-exact —
            # README divergences): the cheapest host decode when extraction is
            # decode-bound and sub-pixel frame fidelity is acceptable.
            t0 = time.perf_counter()
            n = 0
            for clips_b, refs, _ in iter_clip_batches(
                sweep_uris, p.replace(decode_fast=True), batch,
                num_workers=min(8, max(cores, 4)),
            ):
                n += len(refs)
            detail["decode_fast_clips_per_sec"] = round(n / max(time.perf_counter() - t0, 1e-9), 3)

            # Host->device bandwidth: contextualizes the e2e figure — through the dev
            # tunnel this is the e2e bottleneck; on a TPU-attached host it is not.
            buf = np.zeros((batch, 16, 240, 320, 3), np.uint8)
            jnp.asarray(buf).block_until_ready()
            t0 = time.perf_counter()
            np.asarray(jnp.asarray(buf).reshape(-1)[:8])  # force round trip
            dt = time.perf_counter() - t0
            detail["h2d_MB_per_sec"] = round(buf.nbytes / 1e6 / max(dt, 1e-9), 1)
    except Exception as e:  # noqa: BLE001 — the e2e figure is best-effort detail
        detail["e2e_error"] = repr(e)

    print(
        json.dumps(
            {
                "metric": "feature_extraction_clips_per_sec_per_chip",
                "value": round(fused, 3),
                "unit": "clips/s",
                "vs_baseline": round(fused / max(ref_rate, 1e-9), 3),
                "detail": {
                    "batched_fused_clips_per_sec": round(fused, 3),
                    "batch1_unfused_clips_per_sec": round(ref_rate, 3),
                    "fused_ms_per_batch": round(ms_fused, 3),
                    "batch": batch,
                    "device": str(jax.devices()[0]),
                    **detail_top,
                    **detail,
                },
            }
        )
    )


_WATCHDOG = {"timer": None}


def _print_fail_record(detail: str) -> None:
    """The driver's parse contract is exactly one JSON line per round — every
    failure path (crash, watchdog) must emit the same record shape."""
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
    exceptions can run on the main thread — so a daemon timer thread prints the
    failure record itself and hard-exits. Re-arming replaces the previous timer:
    a short budget covers backend init (the common tunnel-down hang, caught in
    minutes), then the full budget covers the measurement phase. 0 disables."""
    import threading

    if _WATCHDOG["timer"] is not None:
        _WATCHDOG["timer"].cancel()
        _WATCHDOG["timer"] = None
    if budget <= 0:
        return

    def _fire():
        _print_fail_record(f"bench exceeded {budget}s during {label} (hung tunnel?)")
        os._exit(1)

    t = threading.Timer(budget, _fire)
    t.daemon = True
    t.start()
    _WATCHDOG["timer"] = t


if __name__ == "__main__":
    try:
        # Short fuse over backend init (tunnel-down hangs die in minutes, not the
        # full bench budget); main() re-arms the full budget once devices respond.
        _arm_watchdog(int(os.environ.get("BENCH_INIT_TIMEOUT_S", "900")), "device init")
        main()
        _arm_watchdog(0, "done")
    except Exception as e:  # noqa: BLE001 — never exit without the JSON line
        # A crash (flaky device tunnel, OOM, ...) must still produce a parseable
        # record rather than an empty BENCH file.
        _print_fail_record(repr(e))
        raise SystemExit(1)
