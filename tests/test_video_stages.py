"""Video clip samplers + action and adversarial-anonymization stage e2e on synthetic
videos (SURVEY.md §4 strategy)."""

import numpy as np
import pytest

from ted_spad_tpu.config.params import ActionParams, AnonymizationParams
from ted_spad_tpu.data.videos import (
    ClipDataset,
    ValClipDataset,
    sample_train_clip,
    sample_triplet_clips,
    synthetic_video_items,
    val_clip_indices,
)


class TestClipSamplers:
    def test_train_clip_strided(self, rng):
        idx = sample_train_clip(rng, frame_count=200, num_frames=16, fix_skip=2)
        assert len(idx) == 16
        assert np.all(np.diff(idx) == 2)
        assert idx[-1] < 200

    def test_short_video_halves_skip(self, rng):
        # frame_count < fix_skip*num_frames -> skip halves (ucf101_dl.py:76-80).
        idx = sample_train_clip(rng, frame_count=20, num_frames=16, fix_skip=2)
        assert len(idx) == 16
        assert idx[-1] <= 19

    def test_triplet_positive_shares_frames(self, rng):
        a, pos, neg = sample_triplet_clips(rng, 300, 16, 2)
        np.testing.assert_array_equal(a, pos)  # temporal_align forced for trip
        assert len(neg) == 16

    def test_triplet_fixed_temporal_distance(self, rng):
        a, _, neg = sample_triplet_clips(rng, 500, 16, 2, temporal_distance=30)
        assert neg[0] == a[0] + 2 * 15 + 30  # start + skip*(n-1) + distance

    def test_val_modes_deterministic_and_ordered(self):
        starts = [val_clip_indices(300, 16, 2, m, 5)[0] for m in range(5)]
        assert starts == sorted(starts)
        assert val_clip_indices(300, 16, 2, 0, 5)[0] == 0


class TestPalindromeRule:
    """Short-clip palindrome completion (ucf101_dl.py:550-567; VERDICT r2 #6): reversed
    frames complete the clip, not a frozen last frame."""

    def test_completion_matches_reference_slice(self):
        from ted_spad_tpu.data.videos import palindrome_complete

        # 10-frame video, clip wants 16 at the halved skip 1: valid frames 0..9 (k=10),
        # missing 6 -> reference appends full_clip[::-1][1:7] == frames [8,7,6,5,4,3].
        out = palindrome_complete(np.arange(16), 10)
        assert out.tolist() == list(range(10)) + [8, 7, 6, 5, 4, 3]

    def test_full_clip_untouched_and_half_or_less_dropped(self):
        from ted_spad_tpu.data.videos import palindrome_complete

        np.testing.assert_array_equal(palindrome_complete(np.arange(16), 16), np.arange(16))
        # k <= n/2: the reference's length assert fails -> clip dropped (None).
        assert palindrome_complete(np.arange(16), 8) is None

    def test_triplet_sampler_palindromes_short_videos(self, rng):
        # 10 frames, 16 wanted: anchor tail must bounce (reversed), never clamp-repeat.
        a, pos, neg = sample_triplet_clips(rng, 10, 16, 2)
        assert a.tolist()[-6:] == [8, 7, 6, 5, 4, 3]
        np.testing.assert_array_equal(a, pos)

    def test_triplet_sampler_drops_too_short(self, rng):
        with pytest.raises(ValueError, match="dropped"):
            sample_triplet_clips(rng, 6, 16, 2)

    def test_single_path_keeps_clamp(self, rng):
        # single_* loaders have no palindrome block in the reference — clamp preserved.
        idx = sample_train_clip(rng, 10, 16, 2)
        assert idx[-1] == 9

    def test_val_palindrome_gated_by_threecrop(self):
        idx = val_clip_indices(10, 16, 2, 0, 5, palindrome=True)
        assert idx.tolist()[-6:] == [8, 7, 6, 5, 4, 3]
        idx_tc = val_clip_indices(10, 16, 2, 0, 5, palindrome=False)
        assert idx_tc[-1] == 9


class TestClipDatasets:
    def _params(self):
        return ActionParams(num_frames=4, fix_skip=2, reso_h=32, reso_w=32, num_classes=5, num_modes=2)

    def test_train_batches_single_view(self):
        items = synthetic_video_items(8, 5, num_frames=40, h=48, w=64)
        ds = ClipDataset(items, self._params(), views=1)
        b = next(iter(ds.batches(4, seed=0)))
        assert b.clips.shape == (4, 1, 4, 48, 64, 3)
        assert b.clips.dtype == np.uint8
        assert b.params is not None

    def test_train_batches_triplet_views_share_crop(self):
        items = synthetic_video_items(8, 5, num_frames=40, h=48, w=64)
        ds = ClipDataset(items, self._params(), views=3)
        b = next(iter(ds.batches(4, seed=0)))
        assert b.clips.shape == (4, 3, 4, 48, 64, 3)
        y0 = b.params.y0.reshape(4, 3)
        np.testing.assert_array_equal(y0[:, 0], y0[:, 1])  # shared crop origin

    def test_val_batches(self):
        items = synthetic_video_items(6, 5, num_frames=40, h=48, w=64)
        ds = ValClipDataset(items, self._params(), mode=1)
        batches = list(ds.batches(4))
        assert sum(b.clips.shape[0] for b in batches) == 6
        assert batches[0].indices is not None


def test_evaluate_action_decodes_once_per_mode(monkeypatch):
    """The cf x hflip TTA sweep must reuse each decoded batch: open_video fires
    exactly num_videos * num_modes times, not * len(cropping_facs) * len(hflip)
    (reference re-pulls the loader per view, train_action.py:330-381)."""
    import ted_spad_tpu.data.videos as videos_mod
    from ted_spad_tpu.stages.action_training import evaluate_action

    p = ActionParams(
        num_frames=4, fix_skip=2, reso_h=32, reso_w=32, num_classes=5,
        num_modes=2, cropping_facs=(0.8, 1.0), hflip=(0, 1), v_batch_size=4,
    )
    items = synthetic_video_items(6, 5, num_frames=40, h=48, w=64)
    opens = {"n": 0}
    real_open = videos_mod.open_video

    def counting_open(*a, **k):
        opens["n"] += 1
        return real_open(*a, **k)

    monkeypatch.setattr(videos_mod, "open_video", counting_open)

    calls = {"n": 0}

    def stub_eval_step(variables, clips, *, cropping_factor, hflip, fa_vars=None):
        calls["n"] += 1
        b = np.asarray(clips).shape[0]
        return np.full((b, p.num_classes), 1.0 / p.num_classes, np.float32)

    acc = evaluate_action(stub_eval_step, None, items, p)
    assert 0.0 <= acc <= 1.0
    assert opens["n"] == len(items) * p.num_modes  # decode once per (video, mode)
    # All TTA views still evaluated: batches_per_mode * num_modes * cfs * hflips.
    batches_per_mode = (len(items) + p.v_batch_size - 1) // p.v_batch_size
    assert calls["n"] == batches_per_mode * p.num_modes * len(p.cropping_facs) * len(p.hflip)


@pytest.mark.slow
def test_action_stage_e2e(tmp_path):
    from ted_spad_tpu.stages.action_training import train_action

    p = ActionParams(
        run_id="act_test", arch="largei3d", num_classes=4, num_frames=8,
        reso_h=32, reso_w=32, batch_size=4, v_batch_size=4, num_modes=2,
        cropping_facs=(0.8,), temporal_loss="trip", learning_rate=1e-3,
        compute_dtype="float32", lr_scheduler="cosine", num_epochs=2,
    )
    train_items = synthetic_video_items(12, 4, num_frames=40, h=48, w=64, seed=0)
    val_items = synthetic_video_items(8, 4, num_frames=40, h=48, w=64, seed=1)
    res = train_action(
        p, train_items=train_items, val_items=val_items, save_dir=str(tmp_path),
        max_epochs=2, log_fn=lambda s: None,
    )
    assert np.isfinite(res["history"]["train_loss"]).all()
    assert 0.0 <= res["history"]["val_acc"][-1] <= 1.0


@pytest.mark.slow
def test_anonymization_stage_e2e(tmp_path):
    from ted_spad_tpu.data.images import SyntheticImageSource
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer

    p = AnonymizationParams(
        run_id="anon_test", num_classes=4, num_frames=8, reso_h=32, reso_w=32,
        batch_size=2, batch_size_vispr=4, v_batch_size=2, num_modes=2,
        cropping_facs=(0.8,), compute_dtype="float32", num_epochs=2,
        save_acc_threshold=-1.0,  # tiny run: always allow best-save
    )
    train_items = synthetic_video_items(8, 4, num_frames=40, h=48, w=64, seed=0)
    val_items = synthetic_video_items(4, 4, num_frames=40, h=48, w=64, seed=1)
    vispr = SyntheticImageSource(n=16, canonical=64)
    res = train_anonymizer(
        p, train_items=train_items, val_items=val_items, vispr_source=vispr,
        save_dir=str(tmp_path), max_epochs=2, log_fn=lambda s: None,
    )
    h = res["history"]
    # Both alternating steps must have produced finite losses.
    assert np.isfinite(h["loss_fa"]).all(), h
    assert np.isfinite(h["loss_fb"]).all(), h
    assert np.isfinite(h["loss_ft"]).all(), h
    assert res["best_path"] is not None  # threshold disabled -> best saved


@pytest.mark.slow
def test_fa_step_remat_blocks_matches_full_remat():
    """remat='blocks' (save_only_these_names over the fused UNet++ boundaries,
    ops/fast_unetpp.TRAIN_REMAT_SAVE_NAMES) is a scheduling policy, not a math
    change: the fa step must produce the same losses and updated params as full
    remat. Also pins that the fused train path actually emits the named
    boundaries at a standard shape (else the policy silently degrades to full
    remat everywhere and the mode is untestable)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ted_spad_tpu.models import load_fa_model, load_fb_model, load_ft_model
    from ted_spad_tpu.stages.anonymization_training import make_fa_step
    from ted_spad_tpu.stages.common import make_optimizer

    p = AnonymizationParams(
        num_classes=4, num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32",
        remat="on",
    )
    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=4, clip_shape=(8, 32, 32), dtype="float32"
    )
    fb_model, fb_vars = load_fb_model(ssl=True, image_size=(32, 32), dtype="float32")

    from ted_spad_tpu.ops.fast_unetpp import (
        TRAIN_REMAT_SAVE_NAMES,
        fast_unetpp_train_apply,
    )
    from ted_spad_tpu.models.resnet2d import ResNet2D

    enc = ResNet2D(block="basic", layers=(2, 2, 2, 2), depth=4, dtype=jnp.float32)
    # encoder_module=None = the inline fast encoder (s2d stem) — the production
    # path; `enc` stays as the non-standard-layout fallback (unused here).
    del enc
    jaxpr = str(
        jax.make_jaxpr(
            lambda v, x: fast_unetpp_train_apply(v, x, encoder_module=None, dtype=jnp.float32)
        )(fa_vars, jnp.zeros((2, 32, 32, 3)))
    )
    for name in TRAIN_REMAT_SAVE_NAMES:
        assert name in jaxpr, f"boundary {name} not emitted by the fused train apply"

    opt_fa = make_optimizer("adam", 1e-3)
    st = opt_fa.init(fa_vars["params"])
    r = np.random.default_rng(0)
    v1 = jnp.asarray(r.random((4, 32, 32, 3)).astype(np.float32))
    v2 = jnp.asarray(r.random((4, 32, 32, 3)).astype(np.float32))
    clips = jnp.asarray(r.random((2, 3, 8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, 4, 2))
    key = jax.random.PRNGKey(0)

    from ted_spad_tpu.models.i3res50 import FT_REMAT_SAVE_NAMES

    ft_jaxpr = str(
        jax.make_jaxpr(
            lambda v, x: ft_model.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
        )(ft_vars, jnp.zeros((1, 8, 32, 32, 3)))
    )
    for name in FT_REMAT_SAVE_NAMES:
        assert name in ft_jaxpr, f"boundary {name} not emitted by I3Res50"

    # The steps donate (consume) their updated-tree arguments — feed copies so the
    # shared starting state survives across remat modes.
    dup = lambda t: jax.tree.map(jnp.copy, t)
    results = {}
    for mode in ("on", "blocks"):
        pm = dataclasses.replace(p, remat=mode)
        step = make_fa_step(fa_model, fb_model, ft_model, opt_fa, pm)
        new_fa, _, *losses = step(dup(fa_vars), dup(st), fb_vars, ft_vars, key, v1, v2, clips, labels)
        results[mode] = (np.asarray([float(x) for x in losses]), new_fa["params"])

    np.testing.assert_allclose(results["blocks"][0], results["on"][0], rtol=1e-5, atol=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(results["on"][1]),
        jax.tree_util.tree_leaves(results["blocks"][1]),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7)

    # Same check for the fused fb/ft update (the trained-ft backward is where the
    # I3Res50 boundary policy applies).
    from ted_spad_tpu.stages.anonymization_training import make_fbft_step

    fbft_results = {}
    for mode in ("on", "blocks"):
        pm = dataclasses.replace(p, remat=mode)
        opt_fb = make_optimizer("adam", 1e-3)
        opt_ft = make_optimizer("adam", 1e-3)
        st_fb, st_ft = opt_fb.init(fb_vars["params"]), opt_ft.init(ft_vars["params"])
        step = make_fbft_step(fa_model, fb_model, ft_model, opt_fb, opt_ft, pm)
        new_fb, new_ft, _, _, *losses = step(
            fa_vars, dup(fb_vars), dup(ft_vars), st_fb, st_ft, key, v1, v2, clips, labels
        )
        fbft_results[mode] = (
            np.asarray([float(x) for x in losses]),
            new_fb["params"],
            new_ft["params"],
        )

    np.testing.assert_allclose(fbft_results["blocks"][0], fbft_results["on"][0], rtol=1e-5, atol=1e-7)
    for tree_i in (1, 2):
        for a, b in zip(
            jax.tree_util.tree_leaves(fbft_results["on"][tree_i]),
            jax.tree_util.tree_leaves(fbft_results["blocks"][tree_i]),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7)


def test_framewise_aug_params_per_frame():
    """frame_wise_aug resamples color params per frame but keeps per-clip crops
    (ucf101_dl.py:127-135)."""
    from ted_spad_tpu.config.params import ActionParams
    from ted_spad_tpu.data.videos import ClipDataset, synthetic_video_items

    p = ActionParams(num_frames=4, fix_skip=2, reso_h=32, reso_w=32, num_classes=3, frame_wise_aug=True)
    ds = ClipDataset(synthetic_video_items(6, 3, num_frames=40, h=48, w=64), p, views=1)
    b = next(iter(ds.batches(4, seed=0)))
    assert b.params.y0.shape[0] == 4 * 1 * 4  # per-frame leading dim
    y0 = b.params.y0.reshape(4, 4)
    np.testing.assert_array_equal(y0[:, 0], y0[:, 1])  # crop shared across frames
    # Color draws differ across frames with overwhelming probability.
    assert len(np.unique(b.params.contrast)) > 4


def test_load_ucf101_list_ids_consistent_across_partial_lists(tmp_path):
    """Without a mapping json, class ids must come from the videos_dir tree so a train
    list and a val list covering different class subsets still agree on ids."""
    from ted_spad_tpu.data.videos import load_ucf101_list

    vids = tmp_path / "videos"
    for cls in ("Archery", "Bowling", "Diving"):
        (vids / cls).mkdir(parents=True)
    train = tmp_path / "train.txt"
    train.write_text("Archery/a.avi 1\nBowling/b.avi 2\nDiving/d.avi 3\n")
    val = tmp_path / "val.txt"
    val.write_text("Bowling/b2.avi\nDiving/d2.avi\n")  # partial class coverage
    t_items = load_ucf101_list(str(train), str(vids))
    v_items = load_ucf101_list(str(val), str(vids))
    t_ids = {i.uri.split("/")[-2]: i.label for i in t_items}
    v_ids = {i.uri.split("/")[-2]: i.label for i in v_items}
    for cls in ("Bowling", "Diving"):
        assert t_ids[cls] == v_ids[cls], (cls, t_ids, v_ids)


@pytest.mark.slow
def test_anonymization_accum_ragged_batch(tmp_path):
    """accum_steps with a batch size not divisible by it: the driver must trim the
    fa batch to a microbatch multiple (corrupt-video drops produce the same shape)
    instead of crashing the in-step reshape — every fa batch here is ragged."""
    from ted_spad_tpu.data.images import SyntheticImageSource
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer

    p = AnonymizationParams(
        run_id="anon_accum_ragged", num_classes=4, num_frames=8, reso_h=32, reso_w=32,
        batch_size=3, batch_size_vispr=4, v_batch_size=2, num_modes=2,
        cropping_facs=(0.8,), compute_dtype="float32", num_epochs=1,
        save_acc_threshold=-1.0, accum_steps=2,
    )
    train_items = synthetic_video_items(9, 4, num_frames=40, h=48, w=64, seed=0)
    val_items = synthetic_video_items(4, 4, num_frames=40, h=48, w=64, seed=1)
    res = train_anonymizer(
        p, train_items=train_items, val_items=val_items,
        vispr_source=SyntheticImageSource(n=16, canonical=64),
        save_dir=str(tmp_path), max_epochs=1, log_fn=lambda s: None,
    )
    h = res["history"]
    assert np.isfinite(h["loss_fa"]).all(), h  # fa steps ran on the trimmed batches
    assert np.isfinite(h["loss_fb"]).all(), h
