"""Compare remat modes for the adversarial fa step at reference scale.

Times ``make_fa_step`` (and optionally the fused fb/ft step) at B videos x 3
views x 16 frames @ 224^2 bf16 (train_anonymizer.py:32-197 shapes) under
``remat`` in {on, blocks, off} — 'blocks' keeps the fused UNet++ boundaries
resident (ops/fast_unetpp.TRAIN_REMAT_SAVE_NAMES policy) and rematerializes
only within-block intermediates.

Run on the real chip:
    python scripts/bench_remat.py --batch 8 --modes on,blocks
B=8 with --modes off OOMs a 16 GB v5e (that is why remat exists); request it
explicitly only on larger-HBM parts.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8, help="videos per step (reference: 8)")
    ap.add_argument("--vispr", type=int, default=12, help="VISPR pairs per step (reference: 12)")
    ap.add_argument("--modes", type=str, default="on,blocks")
    ap.add_argument("--fbft", action="store_true", help="also time the fused fb/ft step per mode")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import device_ms_per_call, tree_sum
    from ted_spad_tpu.config.params import AnonymizationParams
    from ted_spad_tpu.models import load_fa_model, load_fb_model, load_ft_model
    from ted_spad_tpu.stages.anonymization_training import make_fa_step, make_fbft_step
    from ted_spad_tpu.stages.common import make_optimizer

    fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
    )
    fb_model, fb_vars = load_fb_model(ssl=True, image_size=(224, 224), dtype="bfloat16")

    bt, vb = args.batch, args.vispr
    key = jax.random.PRNGKey(0)
    clips = jax.random.uniform(key, (bt, 3, 16, 224, 224, 3), jnp.bfloat16)
    va = jax.random.uniform(key, (vb, 224, 224, 3), jnp.bfloat16)
    vbb = jax.random.uniform(jax.random.PRNGKey(1), (vb, 224, 224, 3), jnp.bfloat16)
    labels = jnp.zeros((bt,), jnp.int32)

    for mode in args.modes.split(","):
        p = AnonymizationParams(num_frames=16, reso_h=224, reso_w=224, remat=mode)
        opt_fa = make_optimizer(p.opt_type, p.learning_rate_fa, p.weight_decay)
        st_fa = opt_fa.init(fa_vars["params"])
        fa_step = make_fa_step(fa_model, fb_model, ft_model, opt_fa, p)

        def fa_once(v1, v2, c, lab):
            new_fa, _, lfa, *_ = fa_step(fa_vars, st_fa, fb_vars, ft_vars, key, v1, v2, c, lab)
            return tree_sum(new_fa["params"]) + lfa

        try:
            ms = device_ms_per_call(fa_once, (va, vbb, clips, labels), iters=args.iters)
            print(f"fa_step   remat={mode:<7} B={bt} vispr={vb}: {ms:8.1f} ms")
        except Exception as e:  # noqa: BLE001 — OOM is an expected outcome here
            print(f"fa_step   remat={mode:<7} B={bt} vispr={vb}: FAILED {type(e).__name__}: {e}")
            continue

        if args.fbft:
            opt_fb = make_optimizer(p.opt_type, p.learning_rate_fb, p.weight_decay)
            opt_ft = make_optimizer(p.opt_type, p.learning_rate_ft, p.weight_decay)
            st_fb, st_ft = opt_fb.init(fb_vars["params"]), opt_ft.init(ft_vars["params"])
            fbft_step = make_fbft_step(fa_model, fb_model, ft_model, opt_fb, opt_ft, p)

            def fbft_once(v1, v2, c, lab):
                new_fb, new_ft, _, _, lfb, *_ = fbft_step(
                    fa_vars, fb_vars, ft_vars, st_fb, st_ft, key, v1, v2, c, lab
                )
                return tree_sum(new_fb["params"]) + tree_sum(new_ft["params"]) + lfb

            try:
                ms = device_ms_per_call(fbft_once, (va, vbb, clips, labels), iters=args.iters)
                print(f"fbft_step remat={mode:<7} B={bt} vispr={vb}: {ms:8.1f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"fbft_step remat={mode:<7} B={bt} vispr={vb}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
