"""Drop-in config compatibility: actual reference params_*.py files must overlay onto the
typed dataclasses (BASELINE.json drop-in workflow requirement). Skipped when the reference
checkout is absent (the package itself never depends on it)."""

import os

import pytest

from ted_spad_tpu.config.params import (
    ActionParams,
    AnonymizationParams,
    FeatureExtractionParams,
    PrivacyParams,
    ReconstructionParams,
    apply_params_file,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout not present")


@needs_ref
def test_overlay_reference_anonymization_params():
    p = apply_params_file(AnonymizationParams(), f"{REF}/anonymization_training/params_anonymization.py")
    # Spot-check the load carried real reference values (params_anonymization.py).
    assert p.arch_ft == "largei3d"
    assert p.temporal_loss == "trip"
    assert p.weak_aug is True
    assert p.ft_loss_weight == pytest.approx(0.7)
    assert p.fb_loss_weight == pytest.approx(1.0)
    assert p.num_frames == 16 and p.fix_skip == 2


@needs_ref
def test_overlay_reference_action_params():
    p = apply_params_file(ActionParams(), f"{REF}/action_training/params_action.py")
    assert p.num_classes == 102
    assert p.reso_h == 224


@needs_ref
def test_overlay_reference_privacy_params():
    p = apply_params_file(PrivacyParams(), f"{REF}/privacy_training/params_privacy.py")
    assert p.num_pa == 7


@needs_ref
def test_overlay_reference_anonymized_action_params():
    p = apply_params_file(
        ActionParams(), f"{REF}/action_training/params_anonymized_action.py"
    )
    assert p.run_id == "baseline_anonymized_action"
    # The reference file names the field arch_ft, which has no ActionParams
    # counterpart (scripts pass --arch); the overlay must still carry the rest.
    assert p.num_classes == 102
    assert p.learning_rate == pytest.approx(1e-4)
    assert p.lr_scheduler == "cosine"
    assert p.cropping_facs == [0.8]


@needs_ref
def test_overlay_reference_feature_extraction_params():
    p = apply_params_file(
        FeatureExtractionParams(), f"{REF}/feature_extraction/params_feature_ex.py"
    )
    assert p.num_frames == 16 and p.fix_skip == 2
    assert p.cropping_factor == pytest.approx(0.8)
    assert p.no_ar_distortion is False
    # The reference extracts one clip per step (params_feature_ex.py batch_size=1);
    # the overlay must carry it even though our default is the batched value.
    assert p.batch_size == 1


@needs_ref
def test_overlay_reference_reconstruction_params():
    p = apply_params_file(ReconstructionParams(), f"{REF}/fa_pretraining/parameters.py")
    assert p.batch_size == 32
    assert p.learning_rate == pytest.approx(1e-3)
    assert p.warmup == 5 and p.scheduled_drop == 5


def test_overlay_missing_file_is_noop():
    p = ActionParams()
    assert apply_params_file(p, None) is p
