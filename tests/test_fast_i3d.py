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


def test_other_arch_falls_back():
    ft_model, ft_vars = load_ft_model("i3d", num_classes=7, clip_shape=(8, 32, 32), dtype="float32")
    x = jnp.ones((1, 8, 32, 32, 3))
    fast = make_fast_ft_extract(ft_model)
    ref = ft_model.apply(ft_vars, x, train=False, method="extract_features")
    np.testing.assert_array_equal(np.asarray(fast(ft_vars, x)), np.asarray(ref))
