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
    encoder_layout_standard,
    fast_encoder_apply,
    fast_encoder_train_apply,
    fast_unetpp_apply,
    make_fast_fa_apply,
    stem2d_s2d_kernel,
    up2_conv,
    up2_fuse_kernel,
    _conv,
    _conv_sp,
    _conv_wpack,
)


class TestKernelTransforms:
    def test_stem2d_s2d_kernel_matches_stride2_conv(self):
        """s2d-rebinned stem == 7x7 stride-2 pad-3 conv (exact permutation)."""
        from ted_spad_tpu.ops.fast_i3d import space_to_depth_2x2

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 20, 3))
        w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 8))
        ref = _conv_sp(x, w, (2, 2), [(3, 3), (3, 3)], jnp.float32)
        got = _conv_sp(
            space_to_depth_2x2(x), stem2d_s2d_kernel(w), (1, 1), [(2, 1), (2, 1)], jnp.float32
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
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


class TestFastEncoderParity:
    """The inline fast encoder (s2d stem + inline BasicBlocks) vs the ResNet2D
    module, eval and train, including updated batch stats."""

    def _enc(self):
        from ted_spad_tpu.models.resnet2d import ResNet2D

        enc = ResNet2D(block="basic", layers=(2, 2, 2, 2), depth=4, dtype=jnp.float32)
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        # Non-trivial running stats so BN folding is actually exercised.
        v = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(3), x.shape), v
        )
        v["batch_stats"] = jax.tree_util.tree_map(jnp.abs, v["batch_stats"])
        return enc, v

    def test_layout_guard(self):
        _, v = self._enc()
        assert encoder_layout_standard(v["params"])
        assert not encoder_layout_standard({})
        assert not encoder_layout_standard({"stem": {"conv": {"kernel": jnp.zeros((3, 3, 3, 64))}}})

    @pytest.mark.parametrize("stem_mode", ["plain", "s2d"])
    def test_eval_matches_module(self, stem_mode):
        enc, v = self._enc()
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
        ref = enc.apply(v, x, train=False)[1:]
        got = fast_encoder_apply(v["params"], v["batch_stats"], x, jnp.float32, stem_mode)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("stem_mode", ["plain", "s2d"])
    def test_train_matches_module(self, stem_mode):
        enc, v = self._enc()
        x = jax.random.normal(jax.random.PRNGKey(6), (3, 32, 32, 3))
        ref, ref_mut = enc.apply(v, x, train=True, mutable=["batch_stats"])
        got, new_stats = fast_encoder_train_apply(
            v["params"], v["batch_stats"], x, jnp.float32, stem_mode
        )
        for a, b in zip(got, ref[1:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
        ref_leaves = jax.tree_util.tree_leaves_with_path(ref_mut["batch_stats"])
        got_leaves = dict(jax.tree_util.tree_leaves_with_path(new_stats))
        assert len(ref_leaves) == len(got_leaves)
        for path, leaf in ref_leaves:
            np.testing.assert_allclose(
                np.asarray(got_leaves[path]), np.asarray(leaf), rtol=2e-4, atol=2e-4,
                err_msg=str(path),
            )

    @pytest.mark.parametrize("stem_mode", ["plain", "s2d"])
    def test_stem_grads_chain_exactly(self, stem_mode):
        """d(loss)/d(stem kernel) through the (linear) stem transform == through
        the module — must match to float tolerance in both modes."""
        enc, v = self._enc()
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 3))

        def loss_mod(k):
            vv = jax.tree_util.tree_map(lambda a: a, v)
            p = dict(vv["params"])
            p["stem"] = {**p["stem"], "conv": {"kernel": k}}
            out = enc.apply({**vv, "params": p}, x, train=False)
            return sum((o * o).mean() for o in out[1:])

        def loss_fast(k):
            p = dict(v["params"])
            p["stem"] = {**p["stem"], "conv": {"kernel": k}}
            out = fast_encoder_apply(p, v["batch_stats"], x, jnp.float32, stem_mode)
            return sum((o * o).mean() for o in out)

        k0 = v["params"]["stem"]["conv"]["kernel"]
        g_mod = jax.grad(loss_mod)(k0)
        g_fast = jax.grad(loss_fast)(k0)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_mod), rtol=5e-3, atol=5e-4)


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

    def test_train_mode_matches_module(self):
        """Fast train path: outputs, updated batch_stats, and grads all match the
        module's train=True, mutable=["batch_stats"] apply."""
        fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
        x = jax.random.normal(jax.random.PRNGKey(9), (3, 32, 32, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)

        ref_out, ref_mut = fa_model.apply(fa_vars, x, train=True, mutable=["batch_stats"])
        out, mut = fast(fa_vars, x, train=True, mutable=["batch_stats"])
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-4, atol=2e-4)

        ref_leaves = jax.tree_util.tree_leaves_with_path(ref_mut["batch_stats"])
        got_tree = mut["batch_stats"]
        got_leaves = dict(jax.tree_util.tree_leaves_with_path(got_tree))
        assert len(ref_leaves) == len(got_leaves)
        for path, leaf in ref_leaves:
            np.testing.assert_allclose(
                np.asarray(got_leaves[path]), np.asarray(leaf), rtol=2e-4, atol=2e-4,
                err_msg=str(path),
            )

        def loss_ref(params):
            o, _ = fa_model.apply(
                {**fa_vars, "params": params}, x, train=True, mutable=["batch_stats"]
            )
            return (o * o).mean()

        def loss_fast(params):
            o, _ = fast({**fa_vars, "params": params}, x, train=True, mutable=["batch_stats"])
            return (o * o).mean()

        g_ref = jax.grad(loss_ref)(fa_vars["params"])
        g_fast = jax.grad(loss_fast)(fa_vars["params"])
        # In float64 the two gradient trees agree to ~1e-8 (verified: the transforms
        # are mathematically exact). In f32, relu masks can flip for pre-activations
        # within reassociation noise of zero, producing isolated large element
        # diffs — so compare with a robust metric: small relative L2 error and a
        # vanishing fraction of outliers.
        for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref), jax.tree_util.tree_leaves_with_path(g_fast)
        ):
            assert p1 == p2
            a, b = np.asarray(l1, np.float64), np.asarray(l2, np.float64)
            scale = max(float(np.abs(a).max()), 1e-6)
            l2rel = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-9)
            frac_bad = float(np.mean(np.abs(b - a) / scale > 5e-2))
            assert l2rel < 2e-2, (str(p1), l2rel)
            assert frac_bad < 2e-3, (str(p1), frac_bad)

    def test_train_mode_with_rngs_falls_back(self):
        fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
        x = jnp.ones((1, 32, 32, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)
        out, updates = fast(
            fa_vars, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        assert out.shape == (1, 32, 32, 3)
        assert "batch_stats" in updates

    def test_non_unetpp_arch_falls_back(self):
        fa_model, fa_vars = load_fa_model(arch="unet", image_size=(32, 32), dtype="float32")
        x = jnp.ones((2, 32, 32, 3))
        fast = make_fast_fa_apply(fa_model, fa_vars)
        np.testing.assert_array_equal(
            np.asarray(fast(fa_vars, x)), np.asarray(fa_model.apply(fa_vars, x, train=False))
        )
