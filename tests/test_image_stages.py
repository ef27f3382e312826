"""Image pipeline + fa-pretraining + privacy stage tests on synthetic sources
(SURVEY.md §4: fake in-memory dataset, 2-epoch e2e on the CPU mesh)."""

import numpy as np
import pytest

from ted_spad_tpu.config.params import PrivacyParams, ReconstructionParams
from ted_spad_tpu.data.images import (
    ImageBatch,
    SyntheticImageSource,
    sample_image_augment_params,
    vispr_batches,
)


class TestImagePipeline:
    def test_synthetic_source_batch(self):
        src = SyntheticImageSource(n=16, num_pa=7, canonical=64)
        imgs, labels = src.get_batch([0, 3, 5])
        assert imgs.shape == (3, 64, 64, 3) and imgs.dtype == np.uint8
        assert labels.shape == (3, 7)

    def test_vispr_batches_train_and_ssl(self):
        src = SyntheticImageSource(n=20, canonical=64)
        batches = list(vispr_batches(src, 4, train=True, ssl=True, out_h=32, out_w=32))
        assert len(batches) == 5
        b = batches[0]
        assert b.params is not None and b.params2 is not None
        # SSL views share the crop origin (vispr_dl.py:197-199) but not sizes.
        np.testing.assert_array_equal(
            np.minimum(b.params.y0, 64 - b.params2.crop_h), b.params2.y0
        )

    def test_eval_batches_have_no_params(self):
        src = SyntheticImageSource(n=8, canonical=64)
        b = next(iter(vispr_batches(src, 4, train=False)))
        assert isinstance(b, ImageBatch) and b.params is None

    def test_augment_batch_device(self):
        import jax.numpy as jnp

        from ted_spad_tpu.ops.augment import augment_batch

        rng = np.random.default_rng(0)
        src = SyntheticImageSource(n=4, canonical=64)
        imgs, _ = src.get_batch([0, 1])
        p = sample_image_augment_params(rng, 2, 64, 32, 32)
        out = augment_batch(jnp.asarray(imgs[:, None]), p.to_device(), 32, 32)
        assert out.shape == (2, 1, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class FlakySource:
    """Source whose get_batch raises on specific call numbers (1-indexed) — models a
    corrupt batch / transient IO failure (train_reconstruction.py:149-203 scenario)."""

    def __init__(self, inner, failing_calls=(1,)):
        self.inner = inner
        self.failing_calls = set(failing_calls)
        self.calls = 0

    def __len__(self):
        return len(self.inner)

    def get_batch(self, indices):
        self.calls += 1
        if self.calls in self.failing_calls:
            raise RuntimeError("injected decode failure")
        return self.inner.get_batch(indices)


def test_reconstruction_survives_bad_epoch(tmp_path):
    """Per-epoch crash-resilience (train_reconstruction.py:149-203): a failing batch
    iterator kills one epoch, not the run."""
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction

    p = ReconstructionParams(
        run_id="recon_flaky", batch_size=4, reso_h=32, reso_w=32, warmup=2,
        arch_fa="unet", compute_dtype="float32",
    )
    # The driver probes get_batch once pre-loop for src_size; call 2 is epoch 1's
    # first train batch — fail exactly that one.
    src = FlakySource(SyntheticImageSource(n=8, canonical=48), failing_calls=(2,))
    logs = []
    res = train_reconstruction(
        p, train_source=src, val_source=None, save_dir=str(tmp_path),
        max_epochs=2, log_fn=logs.append,
    )
    assert any("failed; continuing" in m for m in logs)
    assert len(res["history"]["train_loss"]) == 1  # epoch 1 lost, epoch 2 completed
    assert np.isfinite(res["history"]["train_loss"]).all()


def test_privacy_survives_bad_epoch(tmp_path):
    from ted_spad_tpu.stages.privacy_training import train_privacy

    p = PrivacyParams(
        run_id="priv_flaky", batch_size=4, v_batch_size=4, reso_h=32, reso_w=32,
        num_pa=7, warmup=1, compute_dtype="float32",
    )
    src = FlakySource(SyntheticImageSource(n=8, num_pa=7, canonical=48), failing_calls=(1,))
    val = SyntheticImageSource(n=8, num_pa=7, canonical=48, seed=1)
    logs = []
    res = train_privacy(
        p, train_source=src, val_source=val, save_dir=str(tmp_path),
        max_epochs=2, log_fn=logs.append,
    )
    assert any("failed; continuing" in m for m in logs)
    assert len(res["history"]["cmap"]) == 1


@pytest.mark.slow
def test_reconstruction_stage_e2e(tmp_path):
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction

    p = ReconstructionParams(
        run_id="recon_test", batch_size=4, reso_h=64, reso_w=64, warmup=2, arch_fa="unet", compute_dtype="float32"
    )
    src = SyntheticImageSource(n=16, canonical=96)
    val = SyntheticImageSource(n=8, canonical=96, seed=1)
    res = train_reconstruction(
        p, train_source=src, val_source=val, save_dir=str(tmp_path), max_epochs=2, log_fn=lambda s: None
    )
    tl = res["history"]["train_loss"]
    assert np.isfinite(tl).all()
    assert tl[-1] < tl[0]  # identity reconstruction learns fast
    assert res["best_path"] is not None


@pytest.mark.slow
def test_privacy_stage_e2e(tmp_path):
    from ted_spad_tpu.stages.privacy_training import train_privacy

    p = PrivacyParams(
        run_id="priv_test", batch_size=8, v_batch_size=8, reso_h=64, reso_w=64,
        num_pa=7, warmup=1, compute_dtype="float32",
    )
    src = SyntheticImageSource(n=32, num_pa=7, canonical=96)
    val = SyntheticImageSource(n=16, num_pa=7, canonical=96, seed=1)
    res = train_privacy(
        p, train_source=src, val_source=val, save_dir=str(tmp_path), max_epochs=2, log_fn=lambda s: None
    )
    assert np.isfinite(res["history"]["train_loss"]).all()
    assert 0.0 <= res["best_cmap"] <= 1.0
    assert res["best_path"] is not None
