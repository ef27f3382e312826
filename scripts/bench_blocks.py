"""Per-segment anatomy of the fused extraction program -> computed MFU ceiling.

VERDICT r4 #2: the bench's ``mfu_ceiling_estimate = 0.60`` was a hardcoded number
defending a hardcoded number. This script *measures* it: each segment of the b16
fused extraction program (stages/feature_extraction.py::make_extract_step — the
north-star path, reference hot loop dali_extraction.py:151-179) runs in isolation
on the attached device with honest device timing (bench.device_ms_per_call) and
XLA cost-analysis FLOPs, producing:

  - a per-segment table (ms, GFLOP, TF/s) that sums to ~the fused step time;
  - ``mfu_ceiling_computed`` = the MFU the program would reach if every segment
    ran at its measured isolated rate = total_flops / (sum of segment ms) / peak.
    The fused program cannot beat the sum of its parts at their isolated speeds
    (fusion can only shave the boundaries, which the residual row quantifies);
  - ``unattributed_ms`` = fused_ms - sum(segment ms): scheduling/fusion gap.

The artifact (hw_checklist/block_anatomy.json, committed) is read by bench.py's
mfu section to emit ``detail.mfu_ceiling_computed`` + the per-segment table in
the round's BENCH record (replacing the estimate).

Segments (eval path, bf16, batch 16 x 16 frames):
  preprocess    Pallas fused crop+resize+normalize (240x320 u8 -> 224^2)
  fa_enc_stem   UNet++ r18 encoder stem, s2d re-binned 7x7/2 (ops/fast_unetpp.py)
  fa_enc_layers maxpool + 6 BasicBlocks (layer1-3)
  fa_decoder    fused nested-skip decoder (_decoder_schedule)
  fa_head_s2d   head conv emitting the 2x2 s2d bridge layout
  ft_stem       I3Res50 stem, s2d re-binned (5,7,7)/2 (ops/fast_i3d.py)
  ft_backbone   I3Res50 from stem -> 2048-d features

Usage: ``python scripts/bench_blocks.py [--batch 16] [--out hw_checklist/block_anatomy.json]``
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="hw_checklist/block_anatomy.json")
    ap.add_argument("--quant", action="store_true",
                    help="measure the int8 W8A8 program's segments instead "
                         "(ops/quant_unetpp + quant_i3d; scales calibrated on the "
                         "same random clips; default out becomes "
                         "hw_checklist/block_anatomy_int8.json)")
    args = ap.parse_args()
    if args.quant and args.out == "hw_checklist/block_anatomy.json":
        args.out = "hw_checklist/block_anatomy_int8.json"
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import device_ms_per_call
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops import fast_unetpp as fu
    from ted_spad_tpu.ops.fast_i3d import stem_s2d_kernel
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

    t0 = time.perf_counter()

    def note(msg: str) -> None:
        print(f"[blocks {time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    p = FeatureExtractionParams(num_frames=16, reso_h=224, reso_w=224)
    fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
    )
    B, T = args.batch, 16
    N = B * T  # fa frame batch
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    clips_u8 = jnp.asarray(rng.integers(0, 255, (B, T, 240, 320, 3), dtype=np.uint8))

    p_fa, st_fa = fa_vars["params"], fa_vars["batch_stats"]
    p_enc, st_enc = p_fa["encoder"], st_fa["encoder"]
    key = jax.random.PRNGKey(0)

    # Segment inputs at the exact shapes the fused program produces internally.
    frames = jax.random.uniform(key, (N, 224, 224, 3), jnp.float32)
    f1_in = jax.random.uniform(key, (N, 112, 112, 64), dtype)
    feats_in = [
        jax.random.uniform(key, (N, 14, 14, 256), dtype),   # layer3 /16
        jax.random.uniform(key, (N, 28, 28, 128), dtype),   # layer2 /8
        jax.random.uniform(key, (N, 56, 56, 64), dtype),    # layer1 /4
        jax.random.uniform(key, (N, 112, 112, 64), dtype),  # stem  /2
    ]
    x03_in = jax.random.uniform(key, (N, 224, 224, 32), dtype)
    s2d_in = jax.random.uniform(key, (B, T, 112, 112, 12), dtype)
    ftstem_out = jax.random.uniform(key, (B, 8, 112, 112, 64), dtype)

    # --- segment definitions ----------------------------------------------------
    def seg_preprocess(c):
        from ted_spad_tpu.ops.pallas_preprocess import fused_preprocess

        return fused_preprocess(
            c, out_h=224, out_w=224, cropping_factor=p.cropping_factor, out_dtype=dtype
        ).astype(jnp.float32)

    def seg_fa_enc_stem(x):
        # Production stem form ("plain" — the s2d re-binning measured SLOWER for
        # this 2D shape: 1.05 vs 0.60 ms, recorded negative result in fast_unetpp).
        y = fu._stem_conv(p_enc["stem"], x, dtype)
        sc, bi = fu._bn_affine(p_enc["stem"]["bn"], st_enc["stem"]["bn"])
        return jax.nn.relu(y * sc.astype(dtype) + bi.astype(dtype))

    def seg_fa_enc_layers(f1):
        x = fu._resnet_maxpool(f1)
        for lname, nblocks, stride in fu._R18_ENC_LAYERS:
            for i in range(nblocks):
                x = fu._basic_block_eval(
                    x, p_enc[f"{lname}_{i}"], st_enc[f"{lname}_{i}"],
                    stride if i == 0 else 1, dtype,
                )
        return x

    def seg_fa_decoder(f3, f2, f1, f0):
        def blk(name, xin, skip_sum):
            return fu._up_block_parts(xin, skip_sum, p_fa[name], st_fa[name], dtype)

        return fu._decoder_schedule(p_fa, [f3, f2, f1, f0], dtype, blk)

    def seg_fa_head_s2d(x03):
        ws = fu.head_s2d_kernel(p_fa["head"]["kernel"])
        y = jax.lax.conv_general_dilated(
            x03.astype(dtype), ws.astype(dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dtype,
        )
        return y + jnp.tile(p_fa["head"]["bias"], 4).astype(dtype)

    p_stem = ft_vars["params"]["i3d"]["stem"]
    s_stem = ft_vars["batch_stats"]["i3d"]["stem"]

    def seg_ft_stem(xs):
        ws = stem_s2d_kernel(p_stem["conv"]["kernel"])
        y = jax.lax.conv_general_dilated(
            xs, ws.astype(dtype), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=dtype,
        )
        sc = p_stem["bn"]["scale"] / jnp.sqrt(s_stem["bn"]["var"] + 1e-5)
        bi = p_stem["bn"]["bias"] - s_stem["bn"]["mean"] * sc
        return jax.nn.relu(y * sc.astype(dtype) + bi.astype(dtype))

    def seg_ft_backbone(y):
        return ft_model.apply(ft_vars, y, train=False, method="extract_features_from_stem")

    segments = [
        ("preprocess", seg_preprocess, (clips_u8,)),
        ("fa_enc_stem", seg_fa_enc_stem, (frames,)),
        ("fa_enc_layers", seg_fa_enc_layers, (f1_in,)),
        ("fa_decoder", seg_fa_decoder, tuple(feats_in)),
        ("fa_head_s2d", seg_fa_head_s2d, (x03_in,)),
        ("ft_stem", seg_ft_stem, (s2d_in,)),
        ("ft_backbone", seg_ft_backbone, (ftstem_out,)),
    ]

    quant_scales = None
    if args.quant:
        # --- int8 program variant: same segmentation, quantized compute where the
        # serving path quantizes (enc layers / decoder / ft backbone int8; stem,
        # head, preprocess stay bf16 — ops/quant_unetpp.py design).
        from ted_spad_tpu.ops.quant_i3d import _q_backbone
        from ted_spad_tpu.ops.quant_unetpp import (
            QT,
            _qdecoder,
            _qencoder,
            _Quantizer,
            act_scales_from_absmax,
        )
        from ted_spad_tpu.stages.feature_extraction import make_fa_calibration_step

        note("calibrating activation scales (one batch)")
        calib = make_fa_calibration_step(p, fa_model, ft_model=ft_model)
        stats = calib(fa_vars, ft_vars, clips_u8)
        quant_scales = act_scales_from_absmax(
            {k: float(v) for k, v in stats.items()}
        )

        def qz():
            return _Quantizer("run", quant_scales, dtype)

        def seg_fa_enc_layers_q(f1):
            # _qencoder includes the bf16 stem conv's BN/relu upstream; segment
            # boundary matches the bf16 table: input = stem relu output.
            q = qz()
            q8f3 = q.q8("f3", f1)
            from ted_spad_tpu.ops.quant_unetpp import _F_ALIAS, _qbasic
            import ted_spad_tpu.ops.fast_unetpp as _fu

            x = q.maxpool(q8f3)
            for lname, nblocks, stride in _fu._R18_ENC_LAYERS:
                for i in range(nblocks):
                    site = f"enc_{lname}_{i}"
                    z = _qbasic(q, p_enc[f"{lname}_{i}"], st_enc[f"{lname}_{i}"], x,
                                stride if i == 0 else 1, site)
                    x = q.q8(_F_ALIAS.get((lname, i), f"{site}_out"), z)
            return x.data

        q8 = lambda a: jnp.clip(jnp.round(a.astype(jnp.float32) * 127), -127, 127
                                ).astype(jnp.int8)
        feats_q = [q8(t) for t in feats_in]
        fsites = ["f0", "f1", "f2", "f3"]

        def seg_fa_decoder_q(f0d, f1d, f2d, f3d):
            f = [QT(d, quant_scales[s]) for d, s in zip((f0d, f1d, f2d, f3d), fsites)]
            return _qdecoder(qz(), p_fa, st_fa, f)

        def seg_ft_backbone_q(y):
            return _q_backbone(
                qz(), ft_vars["params"]["i3d"], ft_vars["batch_stats"]["i3d"], y,
                ft_model.layer_specs,
            )

        segments = [
            ("preprocess", seg_preprocess, (clips_u8,)),
            ("fa_enc_stem", seg_fa_enc_stem, (frames,)),
            ("fa_enc_layers", seg_fa_enc_layers_q, (f1_in,)),
            ("fa_decoder", seg_fa_decoder_q, tuple(feats_q)),
            ("fa_head_s2d", seg_fa_head_s2d, (x03_in,)),
            ("ft_stem", seg_ft_stem, (s2d_in,)),
            ("ft_backbone", seg_ft_backbone_q, (ftstem_out,)),
        ]

    def flops_of(fn, fargs) -> float:
        try:
            ca = jax.jit(fn).lower(*fargs).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0)) if ca else 0.0
        except Exception as e:  # noqa: BLE001 — cost analysis is backend-dependent
            note(f"cost_analysis failed: {e!r}")
            return 0.0

    blocks: dict[str, dict] = {}
    for name, fn, fargs in segments:
        ms = device_ms_per_call(fn, fargs, iters=args.iters)
        gf = flops_of(fn, fargs) / 1e9
        blocks[name] = {
            "ms": round(ms, 3),
            "gflops": round(gf, 2),
            "tflops_per_s": round(gf / max(ms, 1e-9), 2),
        }
        note(f"{name:14s} {ms:7.2f} ms  {gf:8.1f} GF  {blocks[name]['tflops_per_s']:6.1f} TF/s")

    # Full fused program, same run, same methodology (the comparator).
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars),
                                quant_act_scales=quant_scales)
    full = lambda c: extract(ft_vars, c)
    fused_ms = device_ms_per_call(full, (clips_u8,), iters=args.iters)
    total_gf = flops_of(full, (clips_u8,)) / 1e9
    note(f"{'fused_full':14s} {fused_ms:7.2f} ms  {total_gf:8.1f} GF")

    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
             "v6 lite": 918e12, "v6e": 918e12}
    peak = next((v for k, v in peaks.items() if k in kind), 197e12)

    sum_ms = sum(b["ms"] for b in blocks.values())
    rec = {
        "device": str(jax.devices()[0]),
        "device_kind": jax.devices()[0].device_kind,
        # int8 records: flops are XLA cost-analysis numbers and mfu_* are vs the
        # bf16 peak — an EFFECTIVE utilization (>0.53 is possible on the 394 TOPS
        # int8 MXU path), comparable to the bf16 table, not a physical fraction.
        "quant": bool(args.quant),
        "batch": B,
        "iters": args.iters,
        "peak_tflops": peak / 1e12,
        "blocks": blocks,
        "sum_blocks_ms": round(sum_ms, 3),
        "fused_ms": round(fused_ms, 3),
        "unattributed_ms": round(fused_ms - sum_ms, 3),
        "total_gflops": round(total_gf, 2),
        "mfu_measured": round(total_gf * 1e9 / (fused_ms / 1e3) / peak, 4),
        # Ceiling: the program running at the sum of its parts' isolated speeds.
        "mfu_ceiling_computed": round(total_gf * 1e9 / (sum_ms / 1e3) / peak, 4),
    }
    _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    note(f"wrote {args.out}: ceiling {rec['mfu_ceiling_computed']}, "
         f"measured {rec['mfu_measured']}, unattributed {rec['unattributed_ms']} ms")


if __name__ == "__main__":
    main()
