"""EXPERIMENT: int8 MXU path for the extraction program's dominant convs.

The computed ceiling (hw_checklist/block_anatomy.json) pins the fused bf16
extraction program at 99.7% of the sum of its parts — the remaining levers are
FLOP/precision-level. TPU v5e's MXU runs int8 at 394 TOPS vs 197 TFLOP/s bf16
(2x). The fa_decoder segment (35.4 ms, 77% of program FLOPs, 119.7 TF/s) is a
chain of 3x3 convs with 32-256 channels: if XLA lowers
``conv_general_dilated(int8, int8) -> int32`` onto the int8 MXU path, a
quantized serving mode could roughly double the decoder segment.

This measures, per representative decoder shape:
  - bf16 conv (the production path)
  - int8 conv with int32 accumulation (quantized candidate)
  - the requantize epilogue (int32 -> scale -> bf16) fused after the conv
plus a plain 8k x 4k x 4k matmul in both precisions as the MXU sanity anchor.

Decision rule: int8 conv >= 1.6x bf16 at the 224^2/112^2 shapes -> build the
opt-in quantized extraction path (--quant int8) with calibration + fidelity
metrics; otherwise record the negative result here (like exp_ft_stem_t2d).
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--frames", type=int, default=256,
                    help="batch of frames (16 clips x 16 frames at the b16 "
                         "extraction operating point)")
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp

    from bench import device_ms_per_call

    N = args.frames
    key = jax.random.PRNGKey(0)

    # --- MXU anchor: plain matmul ------------------------------------------------
    a8 = jax.random.randint(key, (8192, 4096), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (4096, 4096), -127, 127, jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    def mm_bf16(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.bfloat16)

    def mm_int8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    for name, fn, inputs in [("matmul_bf16", mm_bf16, (abf, bbf)),
                             ("matmul_int8", mm_int8, (a8, b8))]:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*inputs))
        ms = device_ms_per_call(jfn, inputs, iters=args.iters)
        tf = 2 * 8192 * 4096 * 4096 / (ms * 1e-3) / 1e12
        print(f"{name}: {ms:.3f} ms  {tf:.1f} T{'OP' if 'int8' in name else 'FLOP'}/s "
              f"(compile {time.perf_counter() - t0:.1f}s)")

    # --- decoder conv shapes -------------------------------------------------
    # (H, W, Cin, Cout): x_0_* full/half-res chains carry most of the 4.2 TFLOP.
    shapes = [
        (224, 224, 32, 32),
        (112, 112, 64, 64),
        (56, 56, 128, 128),
        (112, 112, 99, 64),   # up2-folded conv1-ish mixed-channel shape
    ]

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def conv_int8_requant(x, w, sc):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.maximum(y.astype(jnp.float32) * sc, 0.0).astype(jnp.bfloat16)

    for (h, w_, ci, co) in shapes:
        gflop = 2 * N * h * w_ * 9 * ci * co / 1e9
        x8 = jax.random.randint(key, (N, h, w_, ci), -127, 127, jnp.int8)
        w8 = jax.random.randint(key, (3, 3, ci, co), -127, 127, jnp.int8)
        xb, wb = x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
        sc = jax.random.uniform(key, (co,), jnp.float32) * 1e-3
        rows = []
        for name, fn, inputs in [
            ("bf16", conv_bf16, (xb, wb)),
            ("int8", conv_int8, (x8, w8)),
            ("int8_requant", conv_int8_requant, (x8, w8, sc)),
        ]:
            jfn = jax.jit(fn)
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(jfn(*inputs))
                ms = device_ms_per_call(jfn, inputs, iters=args.iters)
                tf = gflop / ms
                rows.append(f"{name} {ms:.3f} ms ({tf:.1f} T/s)")
            except Exception as e:  # int8 conv may not lower on every backend
                rows.append(f"{name} FAILED: {type(e).__name__}: {str(e)[:120]}")
        print(f"conv {h}x{w_} {ci}->{co} [{gflop:.0f} GFLOP]: " + " | ".join(rows))


if __name__ == "__main__":
    main()
