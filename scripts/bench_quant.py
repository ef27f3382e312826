"""Focused chip measurement: bf16 vs int8-W8A8 fused extraction (ops/quant_unetpp.py).

The bench's quant_int8 section runs this same comparison inside the full driver
envelope; this standalone version is for iterating on the quantized path without
paying for the other sections. Prints rates, the speedup, and the feature-level
fidelity (cosine similarity of the 2048-d ft features vs the bf16 path on the
same clips).
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import device_ms_per_call
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.quant_unetpp import act_scales_from_absmax
    from ted_spad_tpu.stages.feature_extraction import (
        make_extract_step,
        make_fa_calibration_step,
    )

    jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = FeatureExtractionParams(num_frames=16, reso_h=224, reso_w=224)
    fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
    )
    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.integers(0, 255, (args.batch, 16, 240, 320, 3), dtype=np.uint8)
    )

    t0 = time.perf_counter()
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))
    ms_bf16 = device_ms_per_call(lambda c: extract(ft_vars, c), (clips,), iters=args.iters)
    print(f"bf16  fused b{args.batch}: {ms_bf16:7.3f} ms/batch  "
          f"{args.batch / (ms_bf16 / 1e3):7.1f} clips/s  "
          f"(setup {time.perf_counter() - t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    calib = make_fa_calibration_step(p, fa_model, ft_model=ft_model)
    stats = calib(fa_vars, ft_vars, clips)
    scales = act_scales_from_absmax({k: float(v) for k, v in stats.items()})
    fa_scales = {k: v for k, v in scales.items() if not k.startswith("i3d_")}
    extract_qfa = make_extract_step(ft_model, p, fa=(fa_model, fa_vars),
                                    quant_act_scales=fa_scales)
    ms_qfa = device_ms_per_call(lambda c: extract_qfa(ft_vars, c), (clips,),
                                iters=args.iters)
    print(f"int8-fa    fused b{args.batch}: {ms_qfa:7.3f} ms/batch  "
          f"{args.batch / (ms_qfa / 1e3):7.1f} clips/s  "
          f"{ms_bf16 / ms_qfa:5.2f}x bf16  (setup {time.perf_counter() - t0:.0f}s)",
          flush=True)
    del extract_qfa

    t0 = time.perf_counter()
    extract_q = make_extract_step(ft_model, p, fa=(fa_model, fa_vars),
                                  quant_act_scales=scales)
    ms_q = device_ms_per_call(lambda c: extract_q(ft_vars, c), (clips,), iters=args.iters)
    print(f"int8-fa+ft fused b{args.batch}: {ms_q:7.3f} ms/batch  "
          f"{args.batch / (ms_q / 1e3):7.1f} clips/s  "
          f"{ms_bf16 / ms_q:5.2f}x bf16  (setup {time.perf_counter() - t0:.0f}s)", flush=True)

    fq = np.asarray(extract_q(ft_vars, clips))
    fr = np.asarray(extract(ft_vars, clips))
    fq2, fr2 = fq.reshape(-1, fq.shape[-1]), fr.reshape(-1, fr.shape[-1])
    cos = float(np.mean(
        (fq2 * fr2).sum(-1)
        / np.maximum(np.linalg.norm(fq2, axis=-1) * np.linalg.norm(fr2, axis=-1), 1e-12)
    ))
    print(f"feature cossim vs bf16: {cos:.5f}")

    # fa-only comparison of the two up2 modes (mixed bf16-up2 vs all-int8) plus the
    # bf16 fused fa, on the preprocessed frames.
    from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply
    from ted_spad_tpu.ops.pallas_preprocess import fused_preprocess
    from ted_spad_tpu.ops.quant_unetpp import fast_unetpp_apply_q

    frames = jax.jit(
        lambda c: fused_preprocess(
            c, out_h=224, out_w=224, cropping_factor=p.cropping_factor,
            out_dtype=jnp.bfloat16,
        ).astype(jnp.float32).reshape(-1, 224, 224, 3)
    )(clips)
    fa_bf16 = make_fast_fa_apply(fa_model, fa_vars)
    for name, fn in [
        ("fa bf16 fused      ", jax.jit(lambda v, f: fa_bf16(v, f, train=False))),
        ("fa int8 (up2 bf16) ", jax.jit(lambda v, f: fast_unetpp_apply_q(
            v, f, scales, dtype=jnp.bfloat16))),
        ("fa int8 (up2 int8) ", jax.jit(lambda v, f: fast_unetpp_apply_q(
            v, f, scales, dtype=jnp.bfloat16, up2_int8=True))),
    ]:
        ms = device_ms_per_call(fn, (fa_vars, frames), iters=args.iters)
        print(f"{name}: {ms:7.3f} ms / {frames.shape[0]} frames", flush=True)

    # ft-only comparison: bf16 fast stem+module vs quantized, both stem modes.
    from ted_spad_tpu.ops.fast_i3d import make_fast_ft_extract, space_to_depth_2x2
    from ted_spad_tpu.ops.quant_i3d import fast_i3d_features_q

    clips_s2d = jax.jit(
        lambda f: space_to_depth_2x2(f.reshape(args.batch, 16, 224, 224, 3))
    )(frames)
    ft_bf16 = make_fast_ft_extract(ft_model)
    for name, fn in [
        ("ft bf16 fast stem  ", jax.jit(lambda v, x: ft_bf16(v, x, input_s2d=True))),
        ("ft int8 (stem bf16)", jax.jit(lambda v, x: fast_i3d_features_q(
            ft_model, v, x, scales, input_s2d=True))),
        ("ft int8 (stem int8)", jax.jit(lambda v, x: fast_i3d_features_q(
            ft_model, v, x, scales, input_s2d=True, stem_int8=True))),
    ]:
        ms = device_ms_per_call(fn, (ft_vars, clips_s2d), iters=args.iters)
        print(f"{name}: {ms:7.3f} ms / {args.batch} clips", flush=True)


if __name__ == "__main__":
    main()
