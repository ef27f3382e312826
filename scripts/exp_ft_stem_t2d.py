"""EXPERIMENT: widen the I3Res50 stem re-bin from (1,2,2) to (2,2,2).

The anatomy (hw_checklist/block_anatomy.json) shows ft_stem at 4.08 ms /
43.96 TF/s — 22% of peak, the lowest-roofline heavy segment. Its conv runs on
Cin=12 of 128 lanes. Binning the TEMPORAL stride-2 axis too packs 2 frame
phases into channels: Cin 12->24, kernel (5,4,4,12) -> (3,4,4,24), strides
(2,1,1) -> (1,1,1) — the same exact tap transform fast_i3d already applies
spatially (ops/fast_i3d.py::stem_s2d_kernel).

Fine temporal position p = 2t - 2 + j (pad 2, stride 2, kernel 5, j=0..4)
-> coarse tap a = floor((j - 2) / 2) + 1 in {0,1,2}, phase q = (j - 2) mod 2.
Coarse padding (1,1). Nominal MACs rise 960 -> 1152 (zero-padded taps), but
lane occupancy doubles.

Times both forms (including the t-phase repack transpose the fused program
would need) and checks exactness vs the dense stem in f32.

MEASURED (TPU v5 lite, B=16, 2026-08-19): **negative result** — the transform
is exact (max|diff| 1.8e-7) but slower: current (1,2,2) 3.96 ms, t2d (2,2,2)
7.49 ms including the phase repack, 6.65 ms conv-only with a pre-packed input.
Unlike the spatial re-bin (which removed stride-2 *spatial* taps XLA pads to
full windows), the temporal fold raises nominal MACs 960->1152 and trades a
stride-2 kt=5 conv XLA already handles well for a stride-1 kt=3 one it
doesn't; doubling lanes 12->24 (both under the 128-lane MXU width) does not
pay for that. ft_stem stays on the (1,2,2) spatial re-bin
(ops/fast_i3d.py::stem_s2d_kernel), which remains 2.9x the dense stem.
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import device_ms_per_call
    from ted_spad_tpu.models import load_ft_model
    from ted_spad_tpu.ops.fast_i3d import stem_s2d_kernel

    B, T = args.batch, 16
    dtype = jnp.bfloat16
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=102, clip_shape=(16, 224, 224), dtype="bfloat16"
    )
    p_stem = ft_vars["params"]["i3d"]["stem"]
    s_stem = ft_vars["batch_stats"]["i3d"]["stem"]
    key = jax.random.PRNGKey(0)
    s2d_in = jax.random.uniform(key, (B, T, 112, 112, 12), dtype)

    def bn_relu(y):
        sc = p_stem["bn"]["scale"] / jnp.sqrt(s_stem["bn"]["var"] + 1e-5)
        bi = p_stem["bn"]["bias"] - s_stem["bn"]["mean"] * sc
        return jax.nn.relu(y * sc.astype(dtype) + bi.astype(dtype))

    def seg_current(xs):
        ws = stem_s2d_kernel(p_stem["conv"]["kernel"])
        y = jax.lax.conv_general_dilated(
            xs, ws.astype(dtype), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=dtype,
        )
        return bn_relu(y)

    def t2d_kernel(ws):
        # ws: (5,4,4,12,Cout) spatially-binned kernel -> (3,4,4,24,Cout).
        kt, kh, kw, cin, cout = ws.shape
        assert kt == 5, ws.shape
        wt = jnp.zeros((3, kh, kw, 2, cin, cout), ws.dtype)
        for j in range(5):
            a, q = (j - 2) // 2 + 1, (j - 2) % 2
            wt = wt.at[a, :, :, q, :, :].set(ws[j])
        return wt.reshape(3, kh, kw, 2 * cin, cout)

    def t_pack(xs):
        # (B, T, H, W, C) -> (B, T/2, H, W, 2C), phase-major like the kernel.
        b, t, h, w, c = xs.shape
        return xs.reshape(b, t // 2, 2, h, w, c).transpose(0, 1, 3, 4, 2, 5).reshape(
            b, t // 2, h, w, 2 * c
        )

    def seg_t2d(xs):
        ws = t2d_kernel(stem_s2d_kernel(p_stem["conv"]["kernel"]))
        y = jax.lax.conv_general_dilated(
            t_pack(xs), ws.astype(dtype), (1, 1, 1), [(1, 1), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=dtype,
        )
        return bn_relu(y)

    # --- exactness (f32, small shape) ----------------------------------------
    xs32 = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 16, 16, 12), jnp.float32)
    wk = p_stem["conv"]["kernel"].astype(jnp.float32)
    ws = stem_s2d_kernel(wk)
    ref = jax.lax.conv_general_dilated(
        xs32, ws, (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = jax.lax.conv_general_dilated(
        t_pack(xs32), t2d_kernel(ws), (1, 1, 1), [(1, 1), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"exactness max|diff| = {err:.3e} (shapes {ref.shape} vs {got.shape})")
    assert ref.shape == got.shape and err < 1e-4, "t2d transform NOT exact"

    def seg_t2d_prepacked(xp):
        # Conv-only timing: t_pack cost excluded (could fold into the s2d bridge).
        ws = t2d_kernel(stem_s2d_kernel(p_stem["conv"]["kernel"]))
        y = jax.lax.conv_general_dilated(
            xp, ws.astype(dtype), (1, 1, 1), [(1, 1), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=dtype,
        )
        return bn_relu(y)

    packed_in = jax.block_until_ready(jax.jit(t_pack)(s2d_in))

    # --- timing ----------------------------------------------------------------
    for name, fn, inp in [
        ("current_122", seg_current, s2d_in),
        ("t2d_222", seg_t2d, s2d_in),
        ("t2d_222_prepacked", seg_t2d_prepacked, packed_in),
    ]:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(inp))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s out {out.shape}")
        ms = device_ms_per_call(jfn, (inp,), iters=args.iters)
        print(f"{name}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
