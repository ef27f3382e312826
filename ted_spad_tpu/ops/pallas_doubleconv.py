"""Pallas block-fused DoubleConv for the UNet++ decoder's 112² Cout=64 cluster.

**Measured NEGATIVE result (v5e, scripts/microbench_fa.py --dconv; kept like the
wpack rejection as a recorded experiment):** at 112² 128->64->64, the XLA conv pair
runs 1.97 ms for 64 frames (90 TF/s — within ~10% of the 98 TF/s lane-limited
ceiling for Cout=64 on the 128-wide MXU), while this kernel reaches only 20.6 ms
(8.6 TF/s) at th=8 row bands. Mosaic allocates the unrolled 9-tap accumulation's
temporaries WITHOUT cross-statement reuse, so the preferred th=28 band blows the
16 MB VMEM scoped limit (29.7 MB) and the compilable th=8 config drowns in
per-program overhead (896 tiny programs/call). The theoretical upside was small
anyway: the DoubleConv's intermediate HBM round trip is ~0.25 ms of the 1.97 ms —
XLA's fusion already captures most of the cluster. Conclusion: XLA wins; the
kernel stays as a correctness-tested reference for future Mosaic revisions.

Design (kept for the record): the decoder's high-res Cout=64 convs are
lane-starved on the 128-wide MXU (50% lane ceiling), so XLA runs them close to the
*lane-limited* roofline — the remaining slack is the HBM round trip of the
DoubleConv's intermediate activation (conv1 -> BN/ReLU -> conv2 writes a
(N,112,112,64) tensor to HBM that conv2 immediately reads back). This kernel keeps
that intermediate in VMEM: each grid step DMAs one haloed row band of the input,
computes conv1 (+scale/bias+ReLU, BN pre-folded) into a VMEM f32 scratch, applies
conv2 (+scale/bias+ReLU) on the band, and writes only the final output block.

Convolution = 9 shifted matmuls on the MXU: for each (dy, dx) tap,
``acc += x_band[dy:dy+bh, dx:dx+bw, :] @ W[dy, dx]`` with f32 accumulation
(preferred_element_type), matching XLA's conv numerics for bf16 inputs.

Weights carry BN folding (eval mode): callers pass ``w* = w * gamma/sqrt(var+eps)``
per output channel and ``b* = beta - mean * gamma/sqrt(var+eps)`` (see
ops/fast_unetpp's fold helpers); the kernel itself is just conv+bias+ReLU twice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dconv_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xband, mid, acc2, sem,
                  *, th: int, h: int, w: int, cin: int, cmid: int, cout: int):
    """One (frame, row-band) program.

    x_hbm: (N, H+4, W+4, Cin) padded input, resident in HBM/ANY.
    xband: VMEM scratch (th+4, W+4, Cin) — the haloed band.
    mid:   VMEM f32 scratch (th+2, W+2, Cmid) — conv1 output (needs a 1-px halo
           for conv2).
    out_ref: (1, th, W, Cout) output block (plain pipelined BlockSpec).
    """
    n = pl.program_id(0)
    band = pl.program_id(1)
    row0 = band * th

    # Haloed band DMA: rows [row0, row0 + th + 4) of the padded frame.
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(row0, th + 4)], xband, sem
    )
    dma.start()
    dma.wait()

    x = xband[:]  # (th+4, W4p, Cin)

    # conv1: valid 3x3 over the band -> (th+2, W+2, Cmid). Accumulate by
    # read-modify-write on the f32 scratch ref: an SSA `acc = acc + ...` chain
    # keeps all 9 unrolled partials live on the Mosaic stack and OOMs VMEM.
    mid[:] = jnp.broadcast_to(b1_ref[:], (th + 2, w + 2, cmid))
    for dy in range(3):
        for dx in range(3):
            tap = x[dy : dy + th + 2, dx : dx + w + 2, :]
            mid[:] += jax.lax.dot_general(
                tap.reshape((th + 2) * (w + 2), cin),
                w1_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th + 2, w + 2, cmid)
    # conv2's SAME padding must see ZEROS outside the true image — not conv1 applied
    # to the zero-padded input (bias+ReLU make that nonzero). Mask the halo
    # positions that fall outside [0, H) x [0, W).
    ri = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 0) + (row0 - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 1) - 1
    inside = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
    mid[:] = jnp.where(inside, jnp.maximum(mid[:], 0.0), 0.0)

    # conv2: valid 3x3 over the intermediate -> (th, W, Cout), same RMW pattern.
    m = mid[:].astype(w2_ref.dtype)
    acc2[:] = jnp.broadcast_to(b2_ref[:], (th, w, cout))
    for dy in range(3):
        for dx in range(3):
            tap = m[dy : dy + th, dx : dx + w, :]
            acc2[:] += jax.lax.dot_general(
                tap.reshape(th * w, cmid),
                w2_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th, w, cout)
    out_ref[0] = jnp.maximum(acc2[:], 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def fused_double_conv(
    x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
    *, th: int = 28, interpret: bool = False,
) -> Array:
    """relu(conv3x3(relu(conv3x3(x, w1) + b1), w2) + b2), SAME padding, one fused
    Pallas pass (the DoubleConv of models/unet.py:83-84, BN pre-folded into w/b).

    x: (N, H, W, Cin) bf16/f32 with H % th == 0; w1: (3,3,Cin,Cmid);
    w2: (3,3,Cmid,Cout); b1/b2: f32 (Cmid,)/(Cout,). Returns (N, H, W, Cout) in
    x.dtype. ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    n, h, w, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    assert h % th == 0, (h, th)
    # Mosaic DMA slice alignment: the sliced band's sublane dim (W+4) must be a
    # multiple of 8 and the lane dim (Cin) a multiple of 128 — pad both with zeros
    # (zero channels contribute nothing; w1 is zero-padded on its input dim to
    # match). The pads fuse into the producer in XLA.
    w4p = -(-(w + 4) // 8) * 8
    cin_p = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, w4p - w - 2), (0, cin_p - cin)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))

    kernel = functools.partial(
        _dconv_kernel, th=th, h=h, w=w, cin=cin_p, cmid=cmid, cout=cout
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual haloed DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, w4p, cin_p), x.dtype),
            pltpu.VMEM((th + 2, w + 2, cmid), jnp.float32),
            pltpu.VMEM((th, w, cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1p, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))


def double_conv_reference(x, w1, b1, w2, b2):
    """XLA pair for exactness tests / microbenches: the layout the fused kernel must
    match bit-for-bit up to f32-accumulation rounding."""
    def c(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    y = jnp.maximum(c(x, w1) + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    return jnp.maximum(c(y, w2) + b2.astype(jnp.float32), 0.0).astype(x.dtype)


def fold_bn(w: np.ndarray, gamma, beta, mean, var, eps: float = 1e-5):
    """Fold eval-mode BN into conv weights/bias: returns (w*, b*)."""
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    return np.asarray(w) * scale, np.asarray(beta) - np.asarray(mean) * scale
