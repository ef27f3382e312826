"""Capture an XLA/TPU profiler trace of a stage's hot step (jax.profiler; the reference's
only tuning hook is cudnn.benchmark, SURVEY.md §5 — this is the TPU-native upgrade).

Usage: ``python scripts/profile_stage.py --stage extraction --synthetic --cpu``
-> trace under logs/profile_<stage>/ viewable in TensorBoard/Perfetto/xprof.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--stage", type=str, default="extraction", choices=["extraction", "mgfn", "anonymizer"])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from ted_spad_tpu.utils.logging import profile_trace

    out = args.out or f"logs/profile_{args.stage}"
    if args.stage == "extraction":
        from ted_spad_tpu.config.params import FeatureExtractionParams
        from ted_spad_tpu.models import load_fa_model, load_ft_model
        from ted_spad_tpu.stages.feature_extraction import make_extract_step

        size = 64 if args.cpu else 224
        p = FeatureExtractionParams(num_frames=8 if args.cpu else 16, reso_h=size, reso_w=size,
                                    compute_dtype="float32" if args.cpu else "bfloat16")
        fa = load_fa_model(image_size=(size, size), dtype=p.compute_dtype)
        ft_model, ft_vars = load_ft_model("largei3d", num_classes=102,
                                          clip_shape=(p.num_frames, size, size), dtype=p.compute_dtype)
        step = make_extract_step(ft_model, p, fa)
        clips = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (4, p.num_frames, size + 16, size + 32, 3), dtype=np.uint8))
        step(ft_vars, clips).block_until_ready()  # compile outside the trace
        with profile_trace(out):
            for _ in range(3):
                step(ft_vars, clips).block_until_ready()
    elif args.stage == "mgfn":
        from ted_spad_tpu.config.params import MGFNParams
        from ted_spad_tpu.models import load_mgfn_model
        from ted_spad_tpu.stages.anomaly_detection import make_optimizer, make_train_step

        p = MGFNParams(feature_size=256, dims=(64, 128, 256), dim_head=64, batch_size=8)
        model, variables = load_mgfn_model(p, ncrops=2)
        opt = make_optimizer(p)
        st = opt.init(variables["params"])
        step = make_train_step(model, opt, p)
        r = np.random.default_rng(0)
        n = jnp.asarray(r.normal(0, 1, (8, 2, 32, 257)).astype(np.float32))
        a = jnp.asarray(r.normal(0, 1, (8, 2, 32, 257)).astype(np.float32))
        nlab, alab = jnp.zeros(8), jnp.ones(8)
        key = jax.random.PRNGKey(0)
        # The step donates variables/opt_state — chain the updated state through the
        # loop (exactly what the driver does).
        variables, st, _ = step(variables, st, key, n, nlab, a, alab)  # compile + warmup
        jax.block_until_ready(variables)
        with profile_trace(out):
            for _ in range(5):
                variables, st, loss = step(variables, st, key, n, nlab, a, alab)
            jax.block_until_ready(loss)
    else:
        raise SystemExit("anonymizer profiling: run scripts/train_anonymizer.py under profile_trace")
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
