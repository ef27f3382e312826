"""Device-side augmentation op oracles vs torch tensor-functional formulas (torchvision
is absent; the formulas are implemented per its documented semantics in the oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ted_spad_tpu.ops.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    adjust_hue,
    adjust_saturation,
    crop_resize_one,
    erase_box,
    to_grayscale,
)


@pytest.fixture()
def img(rng):
    return rng.random((2, 16, 16, 3)).astype(np.float32)  # (T, H, W, C) in [0,1]


class TestColorOps:
    def test_brightness(self, img):
        out = adjust_brightness(jnp.asarray(img), 1.1)
        np.testing.assert_allclose(np.asarray(out), img * 1.1, rtol=1e-6)

    def test_contrast_blends_with_gray_mean(self, img):
        f = 0.9
        out = np.asarray(adjust_contrast(jnp.asarray(img), f))
        gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
        mean = gray.mean(axis=(-2, -1), keepdims=True)[..., None]
        np.testing.assert_allclose(out, f * img + (1 - f) * mean, rtol=1e-4, atol=1e-6)

    def test_saturation_zero_is_grayscale(self, img):
        out = np.asarray(adjust_saturation(jnp.asarray(img), 0.0))
        gray = np.asarray(to_grayscale(jnp.asarray(img)))
        np.testing.assert_allclose(out, gray, rtol=1e-5, atol=1e-6)

    def test_hue_identity_and_roundtrip(self, img):
        out0 = np.asarray(adjust_hue(jnp.asarray(img), 0.0))
        np.testing.assert_allclose(out0, np.clip(img, 0, 1), atol=2e-5)
        # shifting by +0.5 twice returns to the original hue
        once = adjust_hue(jnp.asarray(img), 0.5)
        twice = np.asarray(adjust_hue(once, 0.5))
        np.testing.assert_allclose(twice, np.clip(img, 0, 1), atol=5e-5)

    def test_gamma(self, img):
        out = np.asarray(adjust_gamma(jnp.asarray(img), 1.2))
        np.testing.assert_allclose(out, np.clip(img, 1e-8, 1) ** 1.2, rtol=1e-4)

    def test_erase_zeroes_box_only(self, img):
        out = np.asarray(erase_box(jnp.asarray(img), 4, 5, 6, 7))
        assert (out[:, 4:10, 5:12] == 0).all()
        mask = np.ones((16, 16), bool)
        mask[4:10, 5:12] = False
        np.testing.assert_array_equal(out[:, mask], img[:, mask])


class TestCropResize:
    def test_identity_crop_resize(self, rng):
        img = rng.random((1, 32, 32, 3)).astype(np.float32)
        out = crop_resize_one(
            jnp.asarray(img), jnp.int32(0), jnp.int32(0), jnp.int32(32), jnp.int32(32), 32, 32
        )
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)

    def test_crop_matches_slice_then_resize_interior(self, rng):
        """Interior pixels match slice-then-resize; the border row/col may differ because
        the affine resample's antialias taps cross the crop boundary (documented
        divergence — torchvision crops before resizing, we resample in one pass)."""
        img = rng.random((1, 40, 40, 3)).astype(np.float32)
        out = crop_resize_one(
            jnp.asarray(img), jnp.int32(8), jnp.int32(4), jnp.int32(24), jnp.int32(28), 16, 16
        )
        ref = jax.image.resize(jnp.asarray(img[:, 8:32, 4:32]), (1, 16, 16, 3), "linear", antialias=True)
        np.testing.assert_allclose(
            np.asarray(out)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2], atol=1e-5
        )
