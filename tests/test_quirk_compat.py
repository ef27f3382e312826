"""quirk_compat plumbing (VERDICT r2 #7): the reference's scrambled reshape
(train_anonymizer.py:86-92 at training; dali_extraction.py:168-173 at extraction,
SURVEY.md §3.1 ⚠) reproduced inside the jitted steps for feature-level A/B debugging
against torch activations."""

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.ops.temporal import (
    extraction_return_scramble_jnp,
    scrambled_frame_view,
    scrambled_frame_view_jnp,
    unscrambled_frame_view,
    unscrambled_frame_view_jnp,
)


class TestScrambleViews:
    def test_jnp_matches_numpy_reference_view(self):
        rng = np.random.default_rng(0)
        video = rng.standard_normal((2, 6, 8, 10, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(scrambled_frame_view_jnp(jnp.asarray(video))),
            scrambled_frame_view(video),
        )

    def test_round_trip_is_identity(self):
        rng = np.random.default_rng(1)
        video = rng.standard_normal((2, 12, 6, 8, 3)).astype(np.float32)
        back = unscrambled_frame_view(scrambled_frame_view(video), 2, 12)
        np.testing.assert_array_equal(back, video)
        back_j = unscrambled_frame_view_jnp(
            scrambled_frame_view_jnp(jnp.asarray(video)), 2, 12
        )
        np.testing.assert_array_equal(np.asarray(back_j), video)

    def test_extraction_return_scramble_matches_torch_reshape(self):
        """The extraction-side reinterpretation equals torch's
        ``x.view(B*T, C, H, W).reshape(B, C, T, H, W)`` on (B, T, C, H, W) memory."""
        rng = np.random.default_rng(2)
        b, t, h, w = 2, 6, 4, 5
        frames_lt = rng.standard_normal((b * t, h, w, 3)).astype(np.float32)
        got = np.asarray(extraction_return_scramble_jnp(jnp.asarray(frames_lt), b, t))
        # numpy emulation of the torch memory reinterpretation:
        mem = frames_lt.transpose(0, 3, 1, 2).reshape(b, t * 3, h, w)  # (B, T*C, H, W)
        ref = mem.reshape(b, 3, t, h, w).transpose(0, 2, 3, 4, 1)  # channels-last
        np.testing.assert_array_equal(got, ref)


def test_anon_frames_quirk_inside_jitted_step():
    """_anon_frames(quirk=True) must equal unscramble(fa(scrambled_frame_view(video)))
    computed outside jit with the plain module — i.e. the quirk path reproduces
    ops/temporal's layout inside the compiled program (VERDICT r2 #7 Done-condition)."""
    from ted_spad_tpu.models import load_fa_model
    from ted_spad_tpu.stages.anonymization_training import _anon_frames

    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    rng = np.random.default_rng(3)
    clips = jnp.asarray(rng.random((2, 3, 4, 32, 32, 3)).astype(np.float32))

    out_quirk, _ = jax.jit(
        lambda v, x: _anon_frames(fa_model, v, x, train=False, quirk=True)
    )(fa_vars, clips)

    video_np = np.asarray(clips).reshape(2, 12, 32, 32, 3)
    scr = jnp.asarray(scrambled_frame_view(video_np))
    anon = np.asarray(fa_model.apply(fa_vars, scr, train=False))
    ref = unscrambled_frame_view(anon, 2, 12).reshape(2, 3, 4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out_quirk), ref, rtol=1e-4, atol=1e-5)

    # And the clean path differs (the quirk is not a no-op).
    out_clean, _ = jax.jit(
        lambda v, x: _anon_frames(fa_model, v, x, train=False, quirk=False)
    )(fa_vars, clips)
    assert not np.allclose(np.asarray(out_clean), np.asarray(out_quirk))


def test_extract_step_quirk_compat():
    """make_extract_step with quirk_compat routes fa output through the reference's
    scrambled return reshape before ft (dali_extraction.py:168-173)."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=5, clip_shape=(6, 32, 32), dtype="float32"
    )
    p = FeatureExtractionParams(
        num_frames=6, reso_h=32, reso_w=32, compute_dtype="float32", quirk_compat=True
    )
    extract = make_extract_step(ft_model, p, fa=(fa_model, fa_vars))

    rng = np.random.default_rng(4)
    clips = jnp.asarray(rng.integers(0, 255, (2, 6, 40, 40, 3), dtype=np.uint8))
    got = extract(ft_vars, clips)

    img = center_crop_resize(clips.astype(jnp.float32) / 255.0, p.cropping_factor, 32, 32)
    frames = img.reshape((-1,) + img.shape[-3:])
    anon = np.asarray(fa_model.apply(fa_vars, frames, train=False))
    scrambled = np.asarray(extraction_return_scramble_jnp(jnp.asarray(anon), 2, 6))
    ref = ft_model.apply(
        ft_vars, jnp.asarray(scrambled), train=False, method="extract_features"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_straddling_bundles_match_torch_reshape():
    """T % 3 != 0 (single 16-frame val clips): the reference's reshape(-1, 3, H, W)
    makes bundles straddle channel boundaries — verify against a numpy emulation of
    the torch memory reinterpretation."""
    rng = np.random.default_rng(5)
    b, t, h, w = 2, 16, 4, 5
    video = rng.standard_normal((b, t, h, w, 3)).astype(np.float32)
    got = scrambled_frame_view(video)
    perm = video.transpose(0, 4, 1, 2, 3)  # (B, C, T, H, W) torch layout
    ref = perm.reshape(-1, 3, h, w).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, ref)
    # jnp agrees; round trip restores.
    np.testing.assert_array_equal(
        np.asarray(scrambled_frame_view_jnp(jnp.asarray(video))), ref
    )
    back = unscrambled_frame_view(got, b, t)
    np.testing.assert_array_equal(back, video)


def test_eval_step_quirk_matches_reference_val_layout():
    """make_eval_step with quirk_compat scrambles the single val clip's fa input
    (train_anonymizer.py:240-243) — verify vs manual composition."""
    from ted_spad_tpu.config.params import ActionParams
    from ted_spad_tpu.models import load_fa_model, load_ft_model
    from ted_spad_tpu.ops.augment import center_crop_resize
    from ted_spad_tpu.stages.action_training import make_eval_step

    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=5, clip_shape=(4, 32, 32), dtype="float32"
    )
    p = ActionParams(num_frames=4, reso_h=32, reso_w=32, compute_dtype="float32",
                     quirk_compat=True)
    eval_step = make_eval_step(ft_model, p, fa_model=fa_model)

    rng = np.random.default_rng(6)
    clips = jnp.asarray(rng.integers(0, 255, (2, 1, 4, 40, 40, 3), dtype=np.uint8))
    probs = eval_step(ft_vars, clips, 0.8, False, fa_vars=fa_vars)

    img = center_crop_resize(clips[:, 0].astype(jnp.float32) / 255.0, 0.8, 32, 32)
    scr = scrambled_frame_view_jnp(img)
    anon = fa_model.apply(fa_vars, scr, train=False)
    from ted_spad_tpu.ops.temporal import unscrambled_frame_view_jnp

    view = unscrambled_frame_view_jnp(anon, 2, 4)
    logits, _ = ft_model.apply(ft_vars, view, train=False)
    ref = jax.nn.softmax(np.asarray(logits, np.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref), rtol=2e-3, atol=2e-3)
