"""Parity tests for the fused UNet++ inference path (ops/fast_unetpp.py).

The fast path re-associates weights (up2+conv folding, width packing, BN folding) but
must match the module apply numerically: same params, same eval semantics as the
reference smp UnetPlusPlus (aux_code/model_loaders.py:18-30)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ted_spad_tpu.models import load_fa_model
from ted_spad_tpu.ops.fast_unetpp import (
    depth_to_space,
    fast_unetpp_apply,
    make_fast_fa_apply,
    up2_conv,
    up2_fuse_kernel,
    _conv,
    _conv_wpack,
)


class TestKernelTransforms:
    def test_up2_fuse_matches_upsample_then_conv(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 8, 8, 5))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7))
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = _conv(up, w, jnp.float32)
        got = depth_to_space(_conv(x, up2_fuse_kernel(w), jnp.float32), 7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_up2_dilated_conv_matches(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 11, 5))
        w = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 5, 7))
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = _conv(up, w, jnp.float32)
        got = up2_conv(x, w, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("r", [2, 4])
    def test_wpack_matches_plain_conv(self, r):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 16, 6))
        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 6, 4))
        ref = _conv(x, w, jnp.float32)
        got = _conv_wpack(x, w, r, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestFastApplyParity:
    def test_matches_module_apply(self):
        fa_model, fa_vars = load_fa_model(image_size=(64, 64), dtype="float32")
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))
        ref = fa_model.apply(fa_vars, x, train=False)
        fast = make_fast_fa_apply(fa_model, fa_vars)
        got = fast(fa_vars, x, train=False)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_emit_s2d_matches_head_output(self):
        from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

        fa_model, fa_vars = load_fa_model(image_size=(64, 64), dtype="float32")
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)
        fine = fast(fa_vars, x, train=False)
        s2d = fast(fa_vars, x, train=False, emit_s2d=True)
        assert s2d.shape == (2, 32, 32, 12)
        np.testing.assert_allclose(
            np.asarray(space_to_depth_2x2(fine)), np.asarray(s2d), rtol=2e-4, atol=2e-4
        )

    def test_train_mode_uses_module(self):
        fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
        x = jnp.ones((1, 32, 32, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)
        # train=True must route through the module (BN batch stats semantics).
        out, updates = fast(fa_vars, x, train=True, mutable=["batch_stats"])
        assert out.shape == (1, 32, 32, 3)
        assert "batch_stats" in updates

    def test_non_unetpp_arch_falls_back(self):
        fa_model, fa_vars = load_fa_model(arch="unet", image_size=(32, 32), dtype="float32")
        x = jnp.ones((2, 32, 32, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)
        np.testing.assert_array_equal(
            np.asarray(fast(fa_vars, x)), np.asarray(fa_model.apply(fa_vars, x, train=False))
        )
