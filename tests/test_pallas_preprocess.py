"""Pallas fused preprocessing kernel vs the pure-XLA reference path (interpret mode on
CPU, per the kernel-verification strategy in .claude/skills/verify)."""

import numpy as np

import jax
import jax.numpy as jnp

from ted_spad_tpu.ops.augment import center_crop_resize
from ted_spad_tpu.ops.pallas_preprocess import fused_preprocess, resize_matrix


class TestResizeMatrix:
    def test_matches_jax_image_resize_operator(self):
        for src, dst in ((48, 56), (64, 56), (320, 224)):
            m_jax = np.asarray(jax.image.resize(jnp.eye(src), (dst, src), "linear", antialias=True))
            m_ours = resize_matrix(src, dst)
            np.testing.assert_allclose(m_ours, m_jax, atol=5e-5)

    def test_rows_are_normalized(self):
        m = resize_matrix(240, 224, crop_start=24, crop_size=192)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
        # No taps outside the crop window.
        assert m[:, :24].sum() == 0 and m[:, 216:].sum() == 0


class TestFusedPreprocess:
    def test_matches_xla_path(self):
        rng = np.random.default_rng(0)
        clips = rng.integers(0, 255, (2, 3, 60, 80, 3), dtype=np.uint8)
        out = fused_preprocess(
            jnp.asarray(clips), out_h=56, out_w=56, out_dtype=jnp.float32, interpret=True
        )
        ref = center_crop_resize(jnp.asarray(clips).astype(jnp.float32) / 255.0, 0.8, 56, 56)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_bf16_output_dtype(self):
        clips = np.zeros((1, 2, 48, 64, 3), np.uint8)
        out = fused_preprocess(jnp.asarray(clips), out_h=32, out_w=32, interpret=True)
        assert out.dtype == jnp.bfloat16
        assert out.shape == (1, 2, 32, 32, 3)
