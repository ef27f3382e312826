"""Parity tests for the s2d fast I3Res50 stem (ops/fast_i3d.py).

The stem tap re-binning is an exact weight permutation, so outputs must match the
module's ``extract_features`` to float tolerance (same params, same eval semantics as
reference large_i3d.py:249-263)."""

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.models import load_ft_model
from ted_spad_tpu.ops.fast_i3d import make_fast_ft_extract, space_to_depth_2x2, stem_s2d_kernel


def test_stem_s2d_conv_matches_plain():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 16, 20, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 7, 3, 8))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = jax.lax.conv_general_dilated(
        space_to_depth_2x2(x), stem_s2d_kernel(w), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    assert got.shape == ref.shape
    # f32 accumulation-order noise between conv algorithms; values are O(30).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fast_extract_matches_module():
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=7, clip_shape=(8, 32, 32), dtype="float32"
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32, 32, 3))
    ref = ft_model.apply(ft_vars, x, train=False, method="extract_features")
    fast = make_fast_ft_extract(ft_model)
    got = fast(ft_vars, x, train=False)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fast_forward_matches_module():
    from ted_spad_tpu.ops.fast_i3d import make_fast_ft_forward

    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=5, clip_shape=(8, 32, 32), dtype="float32"
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32, 32, 3))
    ref_logits, ref_emb = ft_model.apply(ft_vars, x, train=False)
    logits, emb = make_fast_ft_forward(ft_model)(ft_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb), rtol=2e-4, atol=2e-4)


class TestFastTrainForward:
    """make_fast_ft_train_forward: outputs, BN batch-stat updates, AND gradients must
    match the module's train-mode apply — the tap re-binning is linear, so autodiff
    chains d(loss)/d(rebinned kernel) back to the original (5,7,7,3,C) taps exactly.

    Comparison runs in float64 with amplification-aware tolerances. Measured anatomy:
    the s2d stem output matches the module stem to 5e-15 in f64, and the module's
    ``forward_from_stem`` fed the module's own stem output is BIT-identical to the full
    ``__call__`` — so any end-to-end difference is that 5e-15 amplified by the 48
    train-mode BatchNorm renormalizations (measured ~1.5e-5 at the logits; each BN
    divides by a batch std, and relu boundaries discretize the noise). The frozen_bn
    logits path has no batch-stat renormalization and stays at f32-cast rounding
    (~5e-7); the emb path keeps one train BN (MlpHead's, batch of 2) even when frozen
    (the reference's FrozenBN covers only the backbone, model_loaders.py:235-254)."""

    def _setup(self):
        from ted_spad_tpu.ops.fast_i3d import make_fast_ft_train_forward

        ft_model, ft_vars = load_ft_model(
            "largei3d", num_classes=5, clip_shape=(8, 32, 32), dtype="float64"
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 32, 32, 3), jnp.float64)
        rng = jax.random.PRNGKey(7)
        return make_fast_ft_train_forward(ft_model), ft_model, ft_vars, x, rng

    def _module(self, ft_model, ft_vars, x, rng, frozen_bn):
        kw = {"frozen_bn": True} if frozen_bn else {}
        return ft_model.apply(
            ft_vars, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}, **kw
        )

    def test_outputs_and_batch_stats_match(self):
        with jax.enable_x64(True):
            fast, ft_model, ft_vars, x, rng = self._setup()
            for frozen in (False, True):
                (rl, re), rmut = self._module(ft_model, ft_vars, x, rng, frozen)
                (gl, ge), gmut = fast(ft_vars, x, rng=rng, frozen_bn=frozen)
                # Frozen backbone BN -> no renormalization amplification on logits:
                # tight bound pins the stem + assembly; train mode allows the
                # measured ~1.5e-5 chaotic amplification (docstring).
                l_atol = 2e-6 if frozen else 1e-3
                np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-3, atol=l_atol)
                np.testing.assert_allclose(np.asarray(ge), np.asarray(re), rtol=1e-3, atol=1e-3)
                ra = jax.tree_util.tree_leaves_with_path(rmut["batch_stats"])
                ga = dict(jax.tree_util.tree_leaves_with_path(gmut["batch_stats"]))
                assert len(ra) == len(ga)
                for path, leaf in ra:
                    np.testing.assert_allclose(
                        np.asarray(ga[path]), np.asarray(leaf), rtol=1e-3, atol=1e-4,
                        err_msg=str(path),
                    )

    def test_gradients_match(self):
        with jax.enable_x64(True):
            fast, ft_model, ft_vars, x, rng = self._setup()

            # (emb**2) would be degenerate — emb is L2-normalized, so its squared
            # norm is constant and the true gradient 0 (comparison would be pure
            # cancellation noise). Project on a fixed random vector instead.
            v = jax.random.normal(jax.random.PRNGKey(11), (128,), jnp.float64)

            def loss_module(params):
                (logits, emb), _ = self._module(
                    ft_model, {**ft_vars, "params": params}, x, rng, False
                )
                return (logits**2).mean() + (emb * v).mean()

            def loss_fast(params):
                (logits, emb), _ = fast({**ft_vars, "params": params}, x, rng=rng)
                return (logits**2).mean() + (emb * v).mean()

            gr = jax.grad(loss_module)(ft_vars["params"])
            gf = jax.grad(loss_fast)(ft_vars["params"])
            # Robust comparison (same rationale as test_fast_unetpp's grad check):
            # besides the BN amplification of the forward, relu/maxpool TIES can
            # discretely reroute single gradient contributions — relu(x) of a
            # pre-activation within 1e-15 of zero flips between exactly-0 and tiny-
            # positive between the two stems, and a downstream maxpool then picks a
            # different (tied) element. Bound the L2-relative error and the fraction
            # of rerouted elements instead of the elementwise max.
            for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(gr), jax.tree_util.tree_leaves_with_path(gf)
            ):
                assert p1 == p2
                a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
                scale = max(float(np.abs(a).max()), 1e-9)
                l2rel = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-9)
                frac_bad = float(np.mean(np.abs(b - a) / scale > 5e-2))
                assert l2rel < 2e-2, (str(p1), l2rel)
                assert frac_bad < 5e-3, (str(p1), frac_bad)

    def test_odd_size_falls_back_to_module(self):
        from ted_spad_tpu.ops.fast_i3d import make_fast_ft_train_forward

        ft_model, ft_vars = load_ft_model(
            "largei3d", num_classes=3, clip_shape=(4, 30, 30), dtype="float32"
        )
        fast = make_fast_ft_train_forward(ft_model)
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 30, 30, 3))
        rng = jax.random.PRNGKey(6)
        (rl, _), _ = ft_model.apply(
            ft_vars, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
        )
        (gl, _), _ = fast(ft_vars, x, rng=rng)
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(rl))  # same code path


def test_other_arch_falls_back():
    ft_model, ft_vars = load_ft_model("i3d", num_classes=7, clip_shape=(8, 32, 32), dtype="float32")
    x = jnp.ones((1, 8, 32, 32, 3))
    fast = make_fast_ft_extract(ft_model)
    ref = ft_model.apply(ft_vars, x, train=False, method="extract_features")
    np.testing.assert_array_equal(np.asarray(fast(ft_vars, x)), np.asarray(ref))
