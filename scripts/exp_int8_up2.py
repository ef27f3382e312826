"""EXPERIMENT (int8 part 2): up2-conv forms and 3D convs on the int8 MXU path.

exp_int8_conv.py showed plain 3x3 int8 convs run 1.6-1.8x bf16 at the decoder
shapes. The decoder's other conv family is ``conv3x3(nearest_up2(x))``, which
the bf16 fast path runs as ONE lhs-dilated conv (ops/fast_unetpp.py:up2_conv).
This measures, per decoder up2 shape:

  - bf16 lhs-dilated (production)
  - int8 lhs-dilated (quantized candidate, same op)
  - int8 coarse-conv + depth_to_space (the algebraic alternative: stride-1 conv
    with 4x output channels on the coarse grid — plain conv, known-good int8)

plus the I3Res50 3D conv shapes (ft backbone segment, 3.95 ms bf16) to decide
whether the quantized path should extend past the 2D decoder.

Decision rule: pick the faster int8 up2 form if it beats bf16 by >=1.4x;
extend to ft only if int8 3D convs beat bf16 by >=1.4x.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp

    from bench import device_ms_per_call
    from ted_spad_tpu.ops.fast_unetpp import depth_to_space, up2_dilated_kernel, up2_fuse_kernel

    N = args.frames
    key = jax.random.PRNGKey(0)

    # --- up2 conv shapes: (h_coarse, w_coarse, Cin, Cout) — decoder x_i_j up2s.
    shapes = [
        (112, 112, 64, 32),   # x_0_3-class: /2 -> /1
        (56, 56, 64, 64),     # x_0_1/x_1_2-class
        (28, 28, 128, 64),    # x_1_1-class
        (14, 14, 256, 128),   # x_2_2-class
    ]

    def up2_bf16(x, w44):
        # w44 precomputed: up2_dilated_kernel's f32 mixing constants would
        # otherwise promote a bf16 kernel to f32 and crash the dtype check.
        return jax.lax.conv_general_dilated(
            x, w44, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def up2_int8(x, w44):
        return jax.lax.conv_general_dilated(
            x, w44, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def up2_d2s_int8(x, wc, cout):
        y = jax.lax.conv_general_dilated(
            x, wc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return depth_to_space(y, cout)

    for (h, w_, ci, co) in shapes:
        gflop = 2 * N * (2 * h) * (2 * w_) * 9 * ci * co / 1e9
        x8 = jax.random.randint(key, (N, h, w_, ci), -127, 127, jnp.int8)
        w3f = jax.random.randint(key, (3, 3, ci, co), -8, 8, jnp.int8).astype(jnp.float32)
        xb = x8.astype(jnp.bfloat16)
        w3b = w3f.astype(jnp.bfloat16)
        # int8 re-binned kernels: taps sum in pairs, |w44| <= 2*127 fits int8 for |w3|<=63;
        # for timing purposes the int8-coded values just need the dtype.
        w44_8 = up2_dilated_kernel(w3f).astype(jnp.int8)
        wc_8 = up2_fuse_kernel(w3f).astype(jnp.int8)
        w44_b = up2_dilated_kernel(w3f).astype(jnp.bfloat16)
        rows = []
        for name, fn, inputs in [
            ("bf16_dilated", up2_bf16, (xb, w44_b)),
            ("int8_dilated", up2_int8, (x8, w44_8)),
            ("int8_d2s", lambda x, w: up2_d2s_int8(x, w, co), (x8, wc_8)),
        ]:
            jfn = jax.jit(fn)
            try:
                jax.block_until_ready(jfn(*inputs))
                ms = device_ms_per_call(jfn, inputs, iters=args.iters)
                rows.append(f"{name} {ms:.3f} ms ({gflop / ms:.1f} T/s)")
            except Exception as e:
                rows.append(f"{name} FAILED: {type(e).__name__}: {str(e)[:100]}")
        print(f"up2 {h}x{w_} {ci}->{co} [{gflop:.0f} GFLOP]: " + " | ".join(rows), flush=True)

    # --- I3Res50 3D conv shapes (ft backbone; b16 extraction: 16 clips x 16f) --
    shapes3d = [
        (16, 16, 56, 56, 64, 64, (3, 1, 1)),    # layer1-class temporal conv
        (16, 16, 56, 56, 64, 256, (1, 1, 1)),   # 1x1x1 expand
        (16, 4, 28, 28, 128, 128, (1, 3, 3)),   # layer2 spatial conv (post temporal stride)
    ]

    def conv3d(x, w, pet):
        kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1),
            [(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            preferred_element_type=pet)

    iters3d = max(args.iters, 64)  # sub-ms shapes: more trips so the 2K-K
    # differential rises above tunnel timing noise (a 0.000 ms reading means
    # the diff quantized to zero, not a free conv).
    for (b, t, h, w_, ci, co, (kt, kh, kw)) in shapes3d:
        gflop = 2 * b * t * h * w_ * kt * kh * kw * ci * co / 1e9
        x8 = jax.random.randint(key, (b, t, h, w_, ci), -127, 127, jnp.int8)
        w8 = jax.random.randint(key, (kt, kh, kw, ci, co), -127, 127, jnp.int8)
        rows = []
        for name, inputs, pet in [
            ("bf16", (x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)), jnp.bfloat16),
            ("int8", (x8, w8), jnp.int32),
        ]:
            jfn = jax.jit(lambda x, w, p=pet: conv3d(x, w, p))
            try:
                jax.block_until_ready(jfn(*inputs))
                ms = device_ms_per_call(jfn, inputs, iters=iters3d)
                rows.append(f"{name} {ms:.3f} ms ({gflop / ms:.1f} T/s)")
            except Exception as e:
                rows.append(f"{name} FAILED: {type(e).__name__}: {str(e)[:100]}")
        print(f"conv3d {kt}x{kh}x{kw} {ci}->{co} @ {b}x{t}x{h}x{w_} [{gflop:.0f} GFLOP]: "
              + " | ".join(rows), flush=True)


if __name__ == "__main__":
    main()
