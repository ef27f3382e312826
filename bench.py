"""Benchmark: feature-extraction device throughput (clips/sec/chip) — the north-star
metric (BASELINE.json: "clips/sec/chip feature extraction").

Measures the fused extraction program (normalize + center-crop + resize + frozen UNet++
fa per frame + I3Res50 features, bf16) streaming batched clips, exactly the
stages/feature_extraction.py hot path, on whatever device is available (real TPU chip
under the driver; CPU in dev).

``vs_baseline``: the reference pipeline processes ONE clip per step with decode, fa and
ft as separate kernels (dali_extraction.py params_feature_ex.py:4 batch_size=1,
:168-179 separate fa/ft calls with reshape round-trips). We time that same-device
equivalent (batch=1, unfused stages, f32 like torch AMP's fp16/32 mix ~ charitably bf16)
and report fused-batched/batch1-unfused — the measured speedup of the TPU-first design
over a faithful port, on identical hardware.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compile cache: repeated driver runs skip the slow first compile.
    jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

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

    # --- Fused + batched (ours) -------------------------------------------------
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))  # pallas preprocess on TPU
    extract(ft_vars, clips_dev).block_until_ready()  # compile + warmup
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = extract(ft_vars, clips_dev)
    out.block_until_ready()
    fused = batch * n_iters / (time.perf_counter() - t0)

    # --- Reference-style: batch=1, stage-separated programs ----------------------
    @jax.jit
    def prep(c):
        return center_crop_resize(c.astype(jnp.float32) / 255.0, p.cropping_factor, 224, 224)

    @jax.jit
    def fa_fwd(img):
        frames = img.reshape((-1,) + img.shape[-3:])
        a = fa_model.apply(fa_vars, frames, train=False)
        return a.reshape(img.shape[:-3] + a.shape[-3:])

    @jax.jit
    def ft_fwd(img):
        return ft_model.apply(ft_vars, img, train=False, method="extract_features")

    ft_fwd(fa_fwd(prep(one_clip))).block_until_ready()  # compile
    n_ref = 4
    t0 = time.perf_counter()
    for _ in range(n_ref):
        # Separate programs with device-resident handoff (the torch loop chains
        # fa -> ft on-device too; only the python/kernel boundaries differ).
        f = ft_fwd(fa_fwd(prep(one_clip)))
        f.block_until_ready()  # batch=1 sync per clip, like the reference's per-step loop
    ref_style = n_ref / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "feature_extraction_clips_per_sec_per_chip",
                "value": round(fused, 3),
                "unit": "clips/s",
                "vs_baseline": round(fused / max(ref_style, 1e-9), 3),
                "detail": {
                    "batched_fused_clips_per_sec": round(fused, 3),
                    "batch1_unfused_clips_per_sec": round(ref_style, 3),
                    "batch": batch,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
