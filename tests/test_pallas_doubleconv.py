"""Exactness tests for the block-fused DoubleConv kernel (ops/pallas_doubleconv) —
a recorded NEGATIVE perf result on v5e (see the module docstring: XLA's conv pair is
~10x faster at the compilable tile size), kept correctness-tested as a Mosaic
reference. Interpreter mode on the CPU mesh; the TPU numbers live in
scripts/microbench_fa.py --dconv."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ted_spad_tpu.ops.pallas_doubleconv import (  # noqa: E402
    double_conv_reference,
    fold_bn,
    fused_double_conv,
)


@pytest.mark.parametrize(
    "h,w,cin,cmid,th",
    [(56, 56, 128, 64, 28), (28, 56, 320, 64, 14), (56, 56, 192, 64, 28)],
)
def test_fused_matches_xla_pair(h, w, cin, cmid, th):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cmid)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(cmid).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cmid, cmid)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(cmid).astype(np.float32) * 0.1)
    got = np.asarray(fused_double_conv(x, w1, b1, w2, b2, th=th, interpret=True))
    ref = np.asarray(double_conv_reference(x, w1, b1, w2, b2))
    # Equal up to f32 accumulation ordering (both sit the same distance from an
    # f64 ground truth; verified during development).
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-3, rel


def test_edge_halo_sees_zeros_not_conv_of_padding():
    """conv2's SAME pad must be zero outside the image even though conv1(0-pad)+bias
    +ReLU is nonzero — the masking step this kernel needs and XLA gets for free."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 28, 28, 16)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1)
    b1 = jnp.full((8,), 5.0, jnp.float32)  # large bias -> halo would be very nonzero
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((8,), jnp.float32)
    got = np.asarray(fused_double_conv(x, w1, b1, w2, b2, th=14, interpret=True))
    ref = np.asarray(double_conv_reference(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fold_bn_matches_flax_eval_bn():
    """fold_bn(w, gamma, beta, mean, var) must equal conv -> BN(eval) numerics."""
    rng = np.random.default_rng(2)
    cin, cout = 8, 8
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    gamma = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    beta = rng.standard_normal(cout).astype(np.float32)
    mean = rng.standard_normal(cout).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, cout).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, cin)).astype(np.float32))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    ref = (conv(x, jnp.asarray(w)) - mean) * (gamma / np.sqrt(var + 1e-5)) + beta
    wf, bf = fold_bn(w, gamma, beta, mean, var)
    got = conv(x, jnp.asarray(wf)) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
