"""MViTv2-S tests (alternative ft arch, model_loaders.py:217-232)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ted_spad_tpu.models.mvit import MViTv2Config, MViTv2S


def tiny():
    return MViTv2S(
        num_classes=6,
        config=MViTv2Config(
            depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), heads=(1, 2, 4, 8),
            kv_strides=((1, 4, 4), (1, 2, 2), (1, 1, 1), (1, 1, 1)),
        ),
        dtype=jnp.float32,
    )


class TestMViT:
    def test_pred_and_feature(self):
        m = tiny()
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        logits, feat = m.apply(v, x)
        assert logits.shape == (2, 6)
        assert feat.shape == (2, 128)
        assert np.isfinite(np.asarray(logits)).all()

    def test_stage_downsampling(self):
        """q stride (1,2,2) at each stage transition: token grid shrinks 3x spatially."""
        m = tiny()
        x = jnp.zeros((1, 8, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        # Patch embed: (8,64,64) -> (4,16,16); 3 transitions halve H,W each: final (4,2,2).
        # Verify indirectly: final feature exists and the rel-pos tables of the last stage
        # were created at the pooled resolution.
        p = v["params"]["stage3_block0"]["attn"]
        assert p["rel_pos_t"].shape[0] == 2 * 4 - 1

    @pytest.mark.slow
    def test_full_size_s_config(self):
        m = MViTv2S(num_classes=102, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 224, 224, 3))
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(v["params"]))
        # MViTv2-S is ~34M params; allow wide slack for head/rel-pos differences.
        assert 20e6 < n_params < 60e6, n_params
