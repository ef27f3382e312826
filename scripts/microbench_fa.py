"""Microbenchmark the UNet++ fa decoder conv shapes and TPU-friendly reformulations.

The fa decoder's high-res low-channel convs are lane-starved on the 128-wide MXU
(Cout=64 -> 50% lanes, Cout=32 -> 25%). Candidates measured here:
  - baseline: XLA conv_general_dilated NHWC (what flax nn.Conv emits)
  - up+conv fused at coarse res: conv3x3(nearest_up2(x)) == d2s(conv3x3(x, W'))
    with Cout' = 4*Cout — equal FLOPs, 4x output lanes, skips materializing up(x)
  - s2d-domain conv: a stride-1 fine conv applied to the space-to-depth layout
    (4x FLOPs from the block-sparse kernel, 4x lanes)
  - width-packed strided conv: kernel (3, 2+r), stride (1, r), Cout' = r*cout
    ((2+r)/3 x FLOPs, r x lanes)

Timing: under the axon tunnel ``block_until_ready`` does NOT wait for remote
execution — only a host transfer does. We therefore time K vs 2K iterations of a
``lax.fori_loop`` whose body is data-chained (x * (1 + 0*acc) defeats hoisting
without changing values under IEEE semantics), return a scalar, force it with
``np.asarray``, and difference the two timings to cancel the tunnel round trip.

Run on the real chip: `python scripts/microbench_fa.py`.
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
N = 64  # frames per timing batch


def timeit_dev(fn, x, *rest, iters=32):
    """Median device ms per call of fn(x, *rest), tunnel-RTT-cancelled."""

    def make_loop(k):
        @jax.jit
        def loop(x, *rest):
            def body(_, acc):
                out = fn(x * (1.0 + 0.0 * acc).astype(x.dtype), *rest)
                # Full-output reduction: prevents XLA from slicing the op down to
                # the one element a [0]-index would need (DCE defeats the timing).
                return out.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return loop

    l1, l2 = make_loop(iters), make_loop(2 * iters)
    np.asarray(l1(x, *rest)), np.asarray(l2(x, *rest))  # compile + warm

    def run(loop):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(x, *rest))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(l1), run(l2)
    return max(t2 - t1, 1e-9) / iters * 1e3  # ms


def conv(x, w, stride=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DT,
    )


def mk(shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, DT)


def report(tag, h, cin, cout, ms, extra=""):
    gmac = N * h * h * 9 * cin * cout / 1e9
    print(f"{tag:30s} {h:4d}^2 {cin:4d}->{cout:4d}  {ms:7.3f} ms  {2*gmac/ms:6.1f} TF/s {extra}",
          flush=True)


def bench_baseline(h, cin, cout, tag):
    x, w = mk((N, h, h, cin)), mk((3, 3, cin, cout), 1)
    report(tag, h, cin, cout, timeit_dev(conv, x, w))


def up_fused_weights(wnp):
    """Coarse (3,3,cin,4cout) kernel computing conv3x3(nearest_up2(x)) at coarse res."""
    z = np.zeros_like(wnp[0])
    rows = {0: [wnp[0], wnp[1] + wnp[2], z], 1: [z, wnp[0] + wnp[1], wnp[2]]}
    parts = []
    for py in (0, 1):
        for px in (0, 1):
            taps = []
            for r3 in rows[py]:
                z2 = np.zeros_like(r3[0])
                if px == 0:
                    taps.append(np.stack([r3[0], r3[1] + r3[2], z2]))
                else:
                    taps.append(np.stack([z2, r3[0] + r3[1], r3[2]]))
            parts.append(np.stack(taps))  # (3,3,cin,cout)
    return np.concatenate(parts, axis=-1)  # (3,3,cin,4cout)


def d2s(y, cout):
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)


def s2d(t, c):
    n, h, w, _ = t.shape
    t = t.reshape(n, h // 2, 2, w // 2, 2, c)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def bench_up_conv_fused(hc, cin, cout, tag):
    x = mk((N, hc, hc, cin))
    wnp = np.asarray(mk((3, 3, cin, cout), 1), np.float32)
    w = jnp.asarray(wnp, DT)
    wc = jnp.asarray(up_fused_weights(wnp), DT)

    def ref(x, w):
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv(up, w)

    def fused(x, wc):
        return d2s(conv(x, wc), cout)

    def fused_nod2s(x, wc):  # consumer stays in s2d domain
        return conv(x, wc)

    r = np.asarray(jax.jit(ref)(x, w), np.float32)
    f = np.asarray(jax.jit(fused)(x, wc), np.float32)
    err = np.abs(r - f).max() / max(np.abs(r).max(), 1e-6)
    ms_ref = timeit_dev(ref, x, w)
    ms_fused = timeit_dev(fused, x, wc)
    ms_nod2s = timeit_dev(fused_nod2s, x, wc)
    gmac = N * (2 * hc) ** 2 * 9 * cin * cout / 1e9
    print(f"{tag:30s} up2->{hc*2:3d}^2 {cin:4d}->{cout:4d}  ref {ms_ref:7.3f} ({2*gmac/ms_ref:5.1f} TF/s)"
          f"  fused {ms_fused:7.3f} ({2*gmac/ms_fused:5.1f})  no-d2s {ms_nod2s:7.3f}  relerr {err:.2e}",
          flush=True)


def s2d_domain_weights(wnp, cin, cout):
    """(3,3,4cin,4cout) coarse kernel == stride-1 fine conv3x3 in s2d domain."""
    wc = np.zeros((3, 3, 4, cin, 4, cout), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            for dy in range(3):
                for dx in range(3):
                    fy, fx = py + dy - 1, px + dx - 1
                    cy, qy = fy // 2, fy % 2
                    cx, qx = fx // 2, fx % 2
                    wc[cy + 1, cx + 1, qy * 2 + qx, :, py * 2 + px, :] += wnp[dy, dx]
    return wc.reshape(3, 3, 4 * cin, 4 * cout)


def bench_s2d_conv(h, cin, cout, tag):
    x = mk((N, h, h, cin))
    wnp = np.asarray(mk((3, 3, cin, cout), 1), np.float32)
    w = jnp.asarray(wnp, DT)
    wc = jnp.asarray(s2d_domain_weights(wnp, cin, cout), DT)
    xs = jax.jit(lambda t: s2d(t, cin))(x)

    def s2d_conv_only(xs, wc):  # producer+consumer both in s2d domain
        return conv(xs, wc)

    r = np.asarray(jax.jit(conv)(x, w), np.float32)
    f = np.asarray(jax.jit(lambda xs, wc: d2s(conv(xs, wc), cout))(xs, wc), np.float32)
    err = np.abs(r - f).max() / max(np.abs(r).max(), 1e-6)
    ms_ref = timeit_dev(conv, x, w)
    ms_s2d = timeit_dev(s2d_conv_only, xs, wc)
    gmac = N * h * h * 9 * cin * cout / 1e9
    print(f"{tag:30s} {h:4d}^2 {cin:4d}->{cout:4d}  ref {ms_ref:7.3f} ({2*gmac/ms_ref:5.1f} TF/s)"
          f"  s2d-dom {ms_s2d:7.3f} ({2*gmac/ms_s2d:5.1f})  relerr {err:.2e}", flush=True)


def bench_wpack(h, cin, cout, r, tag):
    x = mk((N, h, h, cin))
    wnp = np.asarray(mk((3, 3, cin, cout), 1), np.float32)
    w = jnp.asarray(wnp, DT)
    kw = 2 + r
    wp = np.zeros((3, kw, cin, r, cout), np.float32)
    for j in range(r):
        wp[:, j : j + 3, :, j, :] += wnp
    wp = jnp.asarray(wp.reshape(3, kw, cin, r * cout), DT)

    def packed(x, wp):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + (r - 1)), (0, 0)))
        y = conv(xp, wp, stride=(1, r), padding="VALID")
        n, hh, wr, _ = y.shape
        return y.reshape(n, hh, wr, r, cout).reshape(n, hh, wr * r, cout)

    rr = np.asarray(jax.jit(conv)(x, w), np.float32)
    f = np.asarray(jax.jit(packed)(x, wp), np.float32)
    err = np.abs(rr - f).max() / max(np.abs(rr).max(), 1e-6)
    ms_ref = timeit_dev(conv, x, w)
    ms_p = timeit_dev(packed, x, wp)
    gmac = N * h * h * 9 * cin * cout / 1e9
    print(f"{tag:30s} {h:4d}^2 {cin:4d}->{cout:4d}  ref {ms_ref:7.3f} ({2*gmac/ms_ref:5.1f} TF/s)"
          f"  wpack{r} {ms_p:7.3f} ({2*gmac/ms_p:5.1f})  relerr {err:.2e}", flush=True)


def bench_pallas_dconv(h, cin, cmid, th, tag):
    """Pallas block-fused DoubleConv (ops/pallas_doubleconv) vs the XLA conv pair at
    the decoder cluster shapes (ROADMAP #1): the win, if any, is the intermediate
    activation staying in VMEM instead of an HBM round trip."""
    from ted_spad_tpu.ops.pallas_doubleconv import double_conv_reference, fused_double_conv

    x = mk((N, h, h, cin))
    w1 = mk((3, 3, cin, cmid), 1)
    w2 = mk((3, 3, cmid, cmid), 2)
    b1 = jax.random.normal(jax.random.PRNGKey(3), (cmid,), jnp.float32) * 0.1
    b2 = jax.random.normal(jax.random.PRNGKey(4), (cmid,), jnp.float32) * 0.1

    ref_fn = lambda x: double_conv_reference(x, w1, b1, w2, b2)
    fused_fn = lambda x: fused_double_conv(x, w1, b1, w2, b2, th=th)
    r = np.asarray(jax.jit(ref_fn)(x[:2]), np.float32)
    f = np.asarray(jax.jit(fused_fn)(x[:2]), np.float32)
    err = np.abs(r - f).max() / max(np.abs(r).max(), 1e-6)
    ms_ref = timeit_dev(ref_fn, x, iters=16)
    ms_fus = timeit_dev(fused_fn, x, iters=16)
    gmac = N * h * h * 9 * cmid * (cin + cmid) / 1e9
    print(f"{tag:30s} {h:4d}^2 {cin:4d}->{cmid}->{cmid}  xla-pair {ms_ref:7.3f} "
          f"({2*gmac/ms_ref:5.1f} TF/s)  pallas {ms_fus:7.3f} ({2*gmac/ms_fus:5.1f})  "
          f"relerr {err:.2e}", flush=True)


def bench_pallas_dconv_suite():
    print("== pallas block-fused DoubleConv (112^2 Cout=64 cluster) ==", flush=True)
    bench_pallas_dconv(112, 128, 64, 28, "x_2_2 DoubleConv")
    bench_pallas_dconv(112, 192, 64, 28, "x_1_2 DoubleConv")
    bench_pallas_dconv(112, 320, 64, 28, "x_0_2 DoubleConv")
    bench_pallas_dconv(56, 384, 128, 28, "x_0_1 DoubleConv")


def bench_full_fa():
    from ted_spad_tpu.models import load_fa_model

    fa_model, fa_vars = load_fa_model(image_size=(224, 224), dtype="bfloat16")
    x = mk((N, 224, 224, 3))

    def fa(x):
        return fa_model.apply(fa_vars, x, train=False)

    ms = timeit_dev(fa, x, iters=8)
    print(f"{'FULL fa (UNet++)':30s} {N} frames  {ms:7.3f} ms  "
          f"({N/ms*1e3:.0f} frames/s = {N/16/ms*1e3:.0f} clips/s-equiv)", flush=True)

    from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

    fast = make_fast_fa_apply(fa_model, fa_vars)

    def fa_fast(x):
        return fast(fa_vars, x, train=False)

    r = np.asarray(jax.jit(fa)(x[:2]), np.float32)
    f = np.asarray(jax.jit(fa_fast)(x[:2]), np.float32)
    err = np.abs(r - f).max()
    ms = timeit_dev(fa_fast, x, iters=8)
    print(f"{'FULL fa FAST (fused)':30s} {N} frames  {ms:7.3f} ms  "
          f"({N/ms*1e3:.0f} frames/s = {N/16/ms*1e3:.0f} clips/s-equiv)  abs-err {err:.2e}",
          flush=True)


def main():
    print(f"device: {jax.devices()[0]}, N={N} frames, dtype={DT.__name__}", flush=True)
    bench_full_fa()
    print("== baseline decoder conv shapes ==", flush=True)
    bench_baseline(28, 384, 256, "x_0_0 conv1")
    bench_baseline(56, 384, 128, "x_0_1 conv1")
    bench_baseline(56, 128, 128, "x_0_1 conv2")
    bench_baseline(112, 128, 64, "x_2_2 conv1")
    bench_baseline(112, 192, 64, "x_1_2 conv1")
    bench_baseline(112, 320, 64, "x_0_2 conv1")
    bench_baseline(112, 64, 64, "x_*_2 conv2 (x3)")
    bench_baseline(224, 64, 32, "x_0_3 conv1")
    bench_baseline(224, 32, 32, "x_0_3 conv2")
    bench_baseline(224, 32, 3, "head")
    print("== fused upsample+conv at coarse res ==", flush=True)
    bench_up_conv_fused(112, 64, 32, "x_0_3 conv1 (up-fused)")
    bench_up_conv_fused(56, 64, 64, "x_2_2-like up-part")
    print("== s2d-domain conv ==", flush=True)
    bench_s2d_conv(224, 32, 32, "x_0_3 conv2 (s2d)")
    bench_s2d_conv(112, 64, 64, "x_*_2 conv2 (s2d)")
    print("== width-packed strided conv ==", flush=True)
    bench_wpack(224, 32, 32, 4, "x_0_3 conv2")
    bench_wpack(112, 64, 64, 2, "x_*_2 conv2")
    bench_pallas_dconv_suite()


if __name__ == "__main__":
    import sys

    if "--dconv" in sys.argv:
        print(f"device: {jax.devices()[0]}, N={N} frames, dtype={DT.__name__}", flush=True)
        bench_pallas_dconv_suite()
    else:
        main()
