"""CORE STAGE — 3-model adversarial anonymization training (TeD-SPAD's contribution).

Reference: anonymization_training/train_anonymizer.py (train_epoch:32, val_epoch_video:216,
train_classifier:319). Alternating per-batch schedule:
  - odd batches  ("step 1", :71-123): update **fa** with
    ``loss_fa = -fb_w * NTXent(fb(fa(vispr pair))) + ft_w * (CE(ft(fa(anchor))) +
    0.1 * Triplet(emb(anchor), emb(positive), emb(negative)))``
    while fb/ft run frozen in eval mode;
  - even batches ("step 2", :134-197): freeze fa (no_grad + eval), recompute both losses
    and update **fb** (NT-Xent) and **ft** (CE + triplet) with their own optimizers.

TPU redesign: two jitted SPMD programs (fa_step / fbft_step) the host alternates between.
Freezing = eval-mode batch stats + ``stop_gradient`` instead of ``.eval()``/``no_grad()``;
the fb+ft update runs as ONE fused backward over both parameter trees (losses are
parameter-disjoint, so gradients are exact — and XLA overlaps both models' work).
Mixed precision: bf16 compute replaces AMP autocast (:78, 151) with f32 loss reductions.

NOTE on the reference's reshape quirk (:87-92): it feeds fa 3-slice *time* bundles on the
already-permuted tensor rather than RGB frames (SURVEY.md §3.1 ⚠). We anonymize clean RGB
frames; ``ops/temporal.scrambled_frame_view`` reproduces the quirk for A/B debugging.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.config.params import AnonymizationParams
from ted_spad_tpu.data.images import vispr_batches
from ted_spad_tpu.data.prefetch import prefetch
from ted_spad_tpu.data.videos import ClipDataset
from ted_spad_tpu.models import load_fa_model, load_fb_model, load_ft_model
import functools

from ted_spad_tpu.ops.augment import augment_batch

# Jit the device-side augmentation once (static output size): the adversarial stage calls
# it three times per step (vispr pair + video views); eager dispatch would serialize the
# crop/resize/color chain op-by-op on the host.
_jit_augment = functools.partial(jax.jit, static_argnames=("out_h", "out_w"))(augment_batch)
from ted_spad_tpu.ops.losses import (
    cross_entropy_loss,
    l2_normalize,
    nt_xent_loss,
    supcon_loss,
    triplet_margin_loss,
)
from ted_spad_tpu.stages.action_training import evaluate_action, make_eval_step
from ted_spad_tpu.stages.common import epoch_mean, make_optimizer, set_learning_rate
from ted_spad_tpu.utils.checkpoint import (
    BestCheckpointer,
    async_writer,
    flush_checkpoints,
    save_temp,
)


def _block_policy():
    """save_only_these_names over the fa UNet++ and ft I3Res50 boundary names.
    One shared policy: names absent from a given checkpointed function are simply
    never matched there (e.g. fb emits none — full remat for fb)."""
    from ted_spad_tpu.models.i3res50 import FT_REMAT_SAVE_NAMES
    from ted_spad_tpu.ops.fast_unetpp import TRAIN_REMAT_SAVE_NAMES

    return jax.checkpoint_policies.save_only_these_names(
        *TRAIN_REMAT_SAVE_NAMES, *FT_REMAT_SAVE_NAMES
    )


def _anon_frames(fa_model, fa_vars, video, train: bool, rng=None, remat=True,
                 quirk: bool = False):
    """fa over every frame of (B, V, T, h, w, C); returns same shape, f32.

    ``remat``: rematerialize fa activations in the backward (jax.checkpoint) — at the
    reference scale (8 videos x 3 views x 16 frames at 224², params_anonymization.py) the
    un-checkpointed backward exceeds a v5e chip's 16GB HBM; remat trades ~1 extra forward
    for sub-linear activation memory (the AMP-era GPU memory trick's TPU counterpart).
    ``remat="blocks"``: checkpoint with a save_only_these_names policy over the fused
    UNet++ block boundaries (ops/fast_unetpp.TRAIN_REMAT_SAVE_NAMES) — encoder features
    and decoder block outputs stay resident, only within-block conv/BN intermediates are
    rematerialized; memory between "on" and "off". On the module fallback path no named
    residuals exist, so "blocks" degrades to full remat.

    ``quirk``: reproduce the reference's scrambled fa input (train_anonymizer.py:86-92):
    fa sees 3-slice same-channel time bundles instead of RGB frames, then the output is
    reinterpreted back — applies only to clip tensors (with a time axis); VISPR images
    go through fa clean in the reference too (:80)."""
    from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

    lead = video.shape[:-3]
    if quirk and video.ndim == 6:
        from ted_spad_tpu.ops.temporal import (
            scrambled_frame_view_jnp,
            unscrambled_frame_view_jnp,
        )

        b = video.shape[0]
        vt = video.shape[1] * video.shape[2]  # views concatenated on T (:93-98)
        flat_tv = video.reshape((b, vt) + video.shape[-3:])
        frames = scrambled_frame_view_jnp(flat_tv)
        unscramble = lambda out: unscrambled_frame_view_jnp(out, b, vt).reshape(
            lead + out.shape[-3:]
        )
    else:
        frames = video.reshape((-1,) + video.shape[-3:])
        unscramble = None
    kwargs = {"rngs": {"dropout": rng}} if rng is not None else {}
    # Fused decoder forms (exact weight re-binnings) in train AND eval; the fast
    # apply falls back to the module for non-standard calls (rngs, odd sizes).
    fast = make_fast_fa_apply(fa_model, fa_vars)
    policy = _block_policy() if remat == "blocks" else None
    if train:
        def apply_fn(variables, x):
            return fast(variables, x, train=True, mutable=["batch_stats"], **kwargs)

        if remat:
            apply_fn = jax.checkpoint(apply_fn, policy=policy)
        out, mutated = apply_fn(fa_vars, frames)
        if unscramble is not None:
            return unscramble(out), mutated
        return out.reshape(lead + out.shape[-3:]), mutated
    apply_fn = lambda variables, x: fast(variables, x, train=False)
    if remat:
        apply_fn = jax.checkpoint(apply_fn, policy=policy)
    out = apply_fn(fa_vars, frames)
    if unscramble is not None:
        return unscramble(out), None
    return out.reshape(lead + out.shape[-3:]), None


def _ft_losses(ft_model, ft_vars, anon_clips, labels, p: AnonymizationParams, train: bool, rng=None,
               remat=True):
    """CE + weighted triplet over the anonymized (B, 3, T, h, w, C) views
    (train_anonymizer.py:99-116). One batched ft forward over all views.
    ``remat='blocks'`` keeps the I3Res50 stem/layer2-4 boundaries resident
    (models/i3res50.FT_REMAT_SAVE_NAMES; layer1's 56² outputs rematerialize)."""
    b, v = anon_clips.shape[:2]
    flat = anon_clips.reshape((b * v,) + anon_clips.shape[2:])
    if remat == "blocks":
        ckpt = lambda f: jax.checkpoint(f, policy=_block_policy())
    else:
        ckpt = jax.checkpoint if remat else (lambda f: f)
    if train:
        from ted_spad_tpu.ops.fast_i3d import make_fast_ft_train_forward

        # Train-mode s2d fast stem (exact re-binning, flax-exact stem BN stats);
        # module apply for non-largei3d archs.
        ft_fwd = make_fast_ft_train_forward(ft_model)

        def apply_fn(variables, x):
            return ft_fwd(variables, x, rng=rng)

        (logits, emb), mutated = ckpt(apply_fn)(ft_vars, flat)
    else:
        from ted_spad_tpu.ops.fast_i3d import make_fast_ft_forward

        # Frozen ft: eval-mode forward with the s2d fast stem (gradients still flow
        # through the anonymized clips to fa — the stem re-binning is exact).
        ft_forward = make_fast_ft_forward(ft_model)
        logits, emb = ckpt(
            lambda variables, x: ft_forward(variables, x, train=False)
        )(ft_vars, flat)
        mutated = None
    logits = logits.reshape(b, v, -1)
    emb = emb.reshape(b, v, -1)
    if p.loss == "con":
        # SupCon variant (train_anonymizer.py:95-101): stacked normalized view features.
        loss_cls = supcon_loss(l2_normalize(emb[:, :2], axis=-1), labels)
    else:
        loss_cls = cross_entropy_loss(logits[:, 0], labels)
    loss_temporal = triplet_margin_loss(emb[:, 0], emb[:, 1], emb[:, 2], margin=p.triplet_loss_margin)
    return loss_cls + p.temporal_loss_weight * loss_temporal, loss_temporal, mutated


def _fb_loss(fb_model, fb_vars, anon_pair, p: AnonymizationParams, train: bool,
             remat=True):
    """NT-Xent over the two anonymized VISPR views (train_anonymizer.py:78-84)."""
    ckpt = jax.checkpoint if remat else (lambda f: f)
    if train:
        apply_fn = ckpt(
            lambda variables, x: fb_model.apply(variables, x, train=True, mutable=["batch_stats"])
        )
        z1, m1 = apply_fn(fb_vars, anon_pair[0])
        z2, m2 = apply_fn({**fb_vars, **m1}, anon_pair[1])
        mutated = m2
    else:
        # Frozen fb still sits on fa's gradient path (loss_fb differentiates through
        # the anonymized views), so its ResNet-50 activations are checkpointed under
        # remat exactly like the frozen-ft branch in _ft_losses — an unwrapped apply
        # would keep 2x12 views of 224² activations resident in the fa backward.
        apply_eval = ckpt(lambda variables, x: fb_model.apply(variables, x, train=False))
        z1 = apply_eval(fb_vars, anon_pair[0])
        z2 = apply_eval(fb_vars, anon_pair[1])
        mutated = None
    return nt_xent_loss(z1, z2, p.nt_xent_temperature, p.nt_xent_cosine), mutated


def _resolve_remat(p: AnonymizationParams, clips, vispr1):
    """p.remat='auto': skip rematerialization when the traced batch fits HBM
    without it — measured on a 16 GB v5e: B=4 @ 3 views x 16 frames x 224² (+12
    VISPR pairs) fits and runs ~16% faster (276 vs 329 ms/step); B=8 OOMs. The
    12M frame-pixel threshold is the measured-fits point.
    'on'/'off' force full/no remat; 'blocks' keeps the fa block boundaries
    resident (see _anon_frames). Above the threshold 'auto' resolves to FULL
    remat deliberately: at the reference batch (8 videos + 12 pairs, 224² bf16)
    blocks LOSES to full remat on v5e — fa step 529.1 vs 517.3 ms, fused fb/ft
    185.4 vs 182.4 ms (scripts/bench_remat.py, round 4) — the recompute the
    block policy saves is cheaper than the HBM pressure of its resident
    boundaries at this scale."""
    if p.remat == "on":
        return True
    if p.remat == "off":
        return False
    if p.remat == "blocks":
        return "blocks"
    frames = clips.shape[0] * clips.shape[1] * clips.shape[2] + 2 * vispr1.shape[0]
    return frames * clips.shape[-3] * clips.shape[-2] > 12_000_000


def make_fa_step(
    fa_model, fb_model, ft_model, opt_fa, p: AnonymizationParams, accum_steps: int = 1
) -> Callable:
    """``accum_steps > 1`` splits the batch into microbatches inside the jitted step
    (lax.scan over grads): full reference batch (8 videos + 12 VISPR pairs at 224²,
    params_anonymization.py) on one v5e chip without exceeding HBM. Gradients are the
    mean over microbatches; BN stats chain through the scan.

    DIVERGENCE (documented in README): the contrastive losses are batch-coupled, so
    under accumulation NT-Xent/SupCon contrast within each MICROBATCH — e.g. at
    accum_steps=2 each NT-Xent sees 6 VISPR pairs (10 negatives) instead of the full
    batch's 12 pairs (22 negatives). Accumulation reproduces the reference's memory
    footprint and per-sample gradients for the decomposable losses (CE, triplet),
    not the exact full-batch contrastive value; computing it exactly would require
    keeping every microbatch's fb activations alive, forfeiting the memory saving.

    ``fa_vars``/``opt_state`` buffers are DONATED: XLA writes the updated fa params
    and optimizer moments in place instead of holding old+new copies (~0.5 GB of the
    16 GB v5e HBM at Adam/f32 moments) — callers must reassign, as the driver loop
    does."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fa_step(fa_vars, opt_state, fb_vars, ft_vars, rng, vispr1, vispr2, clips, labels):
        if accum_steps > 1:
            return _fa_step_accum(fa_vars, opt_state, fb_vars, ft_vars, rng, vispr1, vispr2, clips, labels)

        remat = _resolve_remat(p, clips, vispr1)

        def loss_fn(fa_params):
            vars_in = {**fa_vars, "params": fa_params}
            anon_v1, m1 = _anon_frames(fa_model, vars_in, vispr1[:, None], train=True, remat=remat)
            anon_v2, m2 = _anon_frames(fa_model, {**vars_in, **m1}, vispr2[:, None], train=True, remat=remat)
            loss_fb, _ = _fb_loss(fb_model, fb_vars, (anon_v1[:, 0], anon_v2[:, 0]), p, train=False, remat=remat)
            anon_clips, m3 = _anon_frames(fa_model, {**vars_in, **m2}, clips, train=True, quirk=p.quirk_compat, remat=remat)
            loss_ft, loss_temporal, _ = _ft_losses(ft_model, ft_vars, anon_clips, labels, p, train=False, remat=remat)
            loss_fa = -p.fb_loss_weight * loss_fb + p.ft_loss_weight * loss_ft
            return loss_fa, (m3, loss_fb, loss_ft, loss_temporal)

        (loss_fa, (mutated, loss_fb, loss_ft, loss_temporal)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(fa_vars["params"])
        updates, opt_state = opt_fa.update(grads, opt_state, fa_vars["params"])
        params = jax.tree_util.tree_map(lambda x, u: x + u, fa_vars["params"], updates)
        new_fa = {**fa_vars, "params": params, **(mutated or {})}
        return new_fa, opt_state, loss_fa, loss_fb, loss_ft, loss_temporal

    def _fa_step_accum(fa_vars, opt_state, fb_vars, ft_vars, rng, vispr1, vispr2, clips, labels):
        n = accum_steps
        mb = lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:])
        micro = (mb(vispr1), mb(vispr2), mb(clips), mb(labels))

        remat = _resolve_remat(p, clips[: clips.shape[0] // n], vispr1[: vispr1.shape[0] // n])

        def loss_fn(fa_params, batch_stats, mv1, mv2, mclips, mlabels):
            vars_in = {**fa_vars, "params": fa_params, **batch_stats}
            anon_v1, m1 = _anon_frames(fa_model, vars_in, mv1[:, None], train=True, remat=remat)
            anon_v2, m2 = _anon_frames(fa_model, {**vars_in, **m1}, mv2[:, None], train=True, remat=remat)
            loss_fb, _ = _fb_loss(fb_model, fb_vars, (anon_v1[:, 0], anon_v2[:, 0]), p, train=False, remat=remat)
            anon_clips, m3 = _anon_frames(fa_model, {**vars_in, **m2}, mclips, train=True, quirk=p.quirk_compat, remat=remat)
            loss_ft, loss_temporal, _ = _ft_losses(ft_model, ft_vars, anon_clips, mlabels, p, train=False, remat=remat)
            loss_fa = -p.fb_loss_weight * loss_fb + p.ft_loss_weight * loss_ft
            return loss_fa, (m3, loss_fb, loss_ft, loss_temporal)

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, fa_vars["params"])
        init_stats = {k: v for k, v in fa_vars.items() if k != "params"}

        def body(carry, xs):
            grads_acc, stats, losses_acc = carry
            (loss_fa, (mutated, loss_fb, loss_ft, loss_temporal)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(fa_vars["params"], stats, *xs)
            grads_acc = jax.tree_util.tree_map(lambda a, g: a + g / n, grads_acc, grads)
            losses = jnp.asarray([loss_fa, loss_fb, loss_ft, loss_temporal]) / n
            return (grads_acc, mutated, losses_acc + losses), None

        (grads, mutated, losses), _ = jax.lax.scan(
            body, (zero_grads, init_stats, jnp.zeros(4)), micro
        )
        updates, opt_state = opt_fa.update(grads, opt_state, fa_vars["params"])
        params = jax.tree_util.tree_map(lambda x, u: x + u, fa_vars["params"], updates)
        new_fa = {**fa_vars, "params": params, **mutated}
        return new_fa, opt_state, losses[0], losses[1], losses[2], losses[3]

    return fa_step


def make_fbft_step(fa_model, fb_model, ft_model, opt_fb, opt_ft, p: AnonymizationParams) -> Callable:
    # fb/ft params + their optimizer states are donated (in-place update); fa_vars is
    # NOT — the frozen anonymizer is reused by the alternating fa step.
    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def fbft_step(
        fa_vars, fb_vars, ft_vars, opt_fb_state, opt_ft_state, rng, vispr1, vispr2, clips, labels
    ):
        # Frozen fa (eval + stop_gradient), train_anonymizer.py:142-148. remat=False
        # on all three: nothing differentiates through these forwards (stop_gradient
        # below), so jax.checkpoint would never fire anyway — passing the resolved
        # remat here only misleads readers into thinking it is honored.
        remat = _resolve_remat(p, clips, vispr1)
        anon_v1, _ = _anon_frames(fa_model, fa_vars, vispr1[:, None], train=False, remat=False)
        anon_v2, _ = _anon_frames(fa_model, fa_vars, vispr2[:, None], train=False, remat=False)
        anon_clips, _ = _anon_frames(fa_model, fa_vars, clips, train=False, quirk=p.quirk_compat, remat=False)
        anon_v1, anon_v2, anon_clips = map(jax.lax.stop_gradient, (anon_v1, anon_v2, anon_clips))

        def loss_fn(both_params):
            fb_in = {**fb_vars, "params": both_params["fb"]}
            ft_in = {**ft_vars, "params": both_params["ft"]}
            loss_fb, m_fb = _fb_loss(fb_model, fb_in, (anon_v1[:, 0], anon_v2[:, 0]), p, train=True, remat=remat)
            loss_ft, loss_temporal, m_ft = _ft_losses(
                ft_model, ft_in, anon_clips, labels, p, train=True, rng=rng, remat=remat
            )
            # Parameter-disjoint sum: d(loss)/d(fb) == d(loss_fb)/d(fb), same for ft —
            # one backward drives both optimizers (separate backwards in the reference,
            # train_anonymizer.py:186-190).
            return loss_fb + loss_ft, (m_fb, m_ft, loss_fb, loss_ft, loss_temporal)

        both = {"fb": fb_vars["params"], "ft": ft_vars["params"]}
        (_, (m_fb, m_ft, loss_fb, loss_ft, loss_temporal)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(both)
        up_fb, opt_fb_state = opt_fb.update(grads["fb"], opt_fb_state, fb_vars["params"])
        up_ft, opt_ft_state = opt_ft.update(grads["ft"], opt_ft_state, ft_vars["params"])
        new_fb = {**fb_vars, "params": jax.tree_util.tree_map(lambda x, u: x + u, fb_vars["params"], up_fb), **(m_fb or {})}
        new_ft = {**ft_vars, "params": jax.tree_util.tree_map(lambda x, u: x + u, ft_vars["params"], up_ft), **(m_ft or {})}
        return new_fb, new_ft, opt_fb_state, opt_ft_state, loss_fb, loss_ft, loss_temporal

    return fbft_step


def save_vispr_visualization(
    fa_model, fa_vars, images_u8: np.ndarray, out_path: str, reso: tuple[int, int]
) -> str:
    """Per-epoch anonymization PNG grid — original row over anonymized row
    (val_visualization_fa_vispr, train_anonymizer.py:305-315)."""
    from PIL import Image

    from ted_spad_tpu.ops.augment import center_crop_resize

    img = center_crop_resize(
        jnp.asarray(images_u8[:, None]), 1.0, reso[0], reso[1], no_ar_distortion=True
    )[:, 0]
    anon = np.asarray(jnp.clip(fa_model.apply(fa_vars, img, train=False), 0.0, 1.0))
    orig = np.asarray(img)
    top = np.concatenate(list(orig), axis=1)
    bottom = np.concatenate(list(anon), axis=1)
    grid = (np.concatenate([top, bottom], axis=0) * 255 + 0.5).astype(np.uint8)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    Image.fromarray(grid).save(out_path)
    return out_path


def train_anonymizer(
    p: AnonymizationParams,
    *,
    train_items,
    val_items,
    vispr_source,
    save_dir: str = "saved_models",
    max_epochs: int | None = None,
    decode_hw: tuple[int, int] = (0, 0),
    mesh=None,
    log_fn: Callable[[str], None] = print,
    seed: int = 0,
) -> dict[str, Any]:
    """Stage driver (train_anonymizer.py:319-555)."""
    fa_model, fa_vars = load_fa_model(
        p.saved_model_fa, arch=p.arch_fa, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype
    )
    ft_model, ft_vars = load_ft_model(
        p.arch_ft, p.saved_model_ft, num_classes=p.num_classes,
        clip_shape=(p.num_frames, p.reso_h, p.reso_w), dtype=p.compute_dtype,
    )
    fb_model, fb_vars = load_fb_model(
        p.arch_fb, p.saved_model_fb, num_pa=p.num_pa, ssl=True,
        image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype,
    )

    # 3 optimizers with scaled LRs (train_anonymizer.py:377-388; params :55-57).
    opt_fa = make_optimizer(p.opt_type, p.learning_rate_fa, p.weight_decay)
    opt_fb = make_optimizer(p.opt_type, p.learning_rate_fb, p.weight_decay)
    opt_ft = make_optimizer(p.opt_type, p.learning_rate_ft, p.weight_decay)
    st_fa, st_fb, st_ft = (opt_fa.init(fa_vars["params"]), opt_fb.init(fb_vars["params"]), opt_ft.init(ft_vars["params"]))
    if mesh is not None:
        from ted_spad_tpu.parallel import replicate

        fa_vars, fb_vars, ft_vars = (replicate(mesh, v) for v in (fa_vars, fb_vars, ft_vars))
        st_fa, st_fb, st_ft = (replicate(mesh, s_) for s_ in (st_fa, st_fb, st_ft))

    fa_step = make_fa_step(fa_model, fb_model, ft_model, opt_fa, p, accum_steps=p.accum_steps)
    fbft_step = make_fbft_step(fa_model, fb_model, ft_model, opt_fb, opt_ft, p)
    # One jitted eval program; the current fa snapshot is a runtime argument (no
    # per-validation recompile).
    ft_eval = make_eval_step(ft_model, p, fa_model=fa_model)

    video_ds = ClipDataset(
        train_items, p, views=3, data_percentage=p.data_percentage,
        decode_w=decode_hw[1], decode_h=decode_hw[0], seed=seed,
    )
    best = BestCheckpointer(
        os.path.join(save_dir, p.run_id), "model", mode="max", threshold=p.save_acc_threshold
    )
    rng = jax.random.PRNGKey(seed)
    epochs = max_epochs or p.num_epochs
    history = {"loss_fa": [], "loss_fb": [], "loss_ft": [], "loss_temporal": [], "val_acc": []}
    from ted_spad_tpu.utils.logging import MetricsWriter, config_dump

    writer = MetricsWriter(save_dir, p.run_id)
    config_dump(writer, p)

    for epoch in range(1, epochs + 1):
        t0 = time.time()
        # Constant LRs by default — the reference's scheduler block is commented out
        # (train_anonymizer.py:432-450); cosine only when explicitly enabled.
        if p.use_lr_schedule:
            arr = p.cosine_lr_array
            scale = arr[min(epoch - 1, len(arr) - 1)]
        else:
            scale = 1.0
        st_fa = set_learning_rate(st_fa, scale * p.learning_rate_fa)
        st_fb = set_learning_rate(st_fb, scale * p.learning_rate_fb)
        st_ft = set_learning_rate(st_ft, scale * p.learning_rate_ft)

        vispr_it = vispr_batches(
            vispr_source, p.batch_size_vispr, train=True, ssl=True,
            out_h=p.reso_h, out_w=p.reso_w, seed=seed + epoch,
        )
        video_it = video_ds.batches(p.batch_size, seed=seed + epoch)
        step = 1
        ep_losses = {"fa": [], "fb": [], "ft": [], "temporal": []}
        # prefetch: both modalities' host decode (the video pool.map straggler tail +
        # PIL image loads) runs a batch ahead on a producer thread, off the dispatch
        # critical path of the alternating fa / fb-ft steps.
        with prefetch(zip(vispr_it, video_it)) as paired_it:
            for vispr_b, video_b in paired_it:
                rng, k1, k2 = jax.random.split(rng, 3)
                # Device-side augmentation for both modalities.
                v_imgs = jnp.asarray(vispr_b.images)
                v1 = _jit_augment(v_imgs[:, None], vispr_b.params.to_device(), out_h=p.reso_h, out_w=p.reso_w)[:, 0]
                v2 = _jit_augment(v_imgs[:, None], vispr_b.params2.to_device(), out_h=p.reso_h, out_w=p.reso_w)[:, 0]
                b, v = video_b.clips.shape[:2]
                flat = jnp.asarray(video_b.clips).reshape((b * v,) + video_b.clips.shape[2:])
                clips = _jit_augment(flat, video_b.params.to_device(), out_h=p.reso_h, out_w=p.reso_w)
                clips = clips.reshape((b, v) + clips.shape[1:])
                labels = jnp.asarray(video_b.labels)
                if mesh is not None and b % mesh.devices.size == 0 and v1.shape[0] % mesh.devices.size == 0:
                    from ted_spad_tpu.parallel import shard_batch

                    v1, v2, clips, labels = shard_batch(mesh, (v1, v2, clips, labels))

                if step == 1:
                    fv1, fv2, fclips, flabels = v1, v2, clips, labels
                    if p.accum_steps > 1:
                        # Ragged batches (corrupt-video drops, the min-2 collate
                        # filter, videos.py) break the in-step microbatch reshape:
                        # trim to a multiple of accum_steps (rare, so the retrace on
                        # a new shape is fine); skip the pair entirely when fewer
                        # samples than microbatches survive.
                        na = p.accum_steps
                        bm = (fclips.shape[0] // na) * na
                        vm = (min(fv1.shape[0], fv2.shape[0]) // na) * na
                        if bm == 0 or vm == 0:
                            continue
                        fv1, fv2 = fv1[:vm], fv2[:vm]
                        fclips, flabels = fclips[:bm], flabels[:bm]
                    fa_vars, st_fa, lfa, lfb, lft, ltemp = fa_step(
                        fa_vars, st_fa, fb_vars, ft_vars, k1, fv1, fv2, fclips, flabels
                    )
                    ep_losses["fa"].append(lfa)  # raw device scalars; one sync per epoch
                    step = 2
                else:
                    fb_vars, ft_vars, st_fb, st_ft, lfb, lft, ltemp = fbft_step(
                        fa_vars, fb_vars, ft_vars, st_fb, st_ft, k2, v1, v2, clips, labels
                    )
                    ep_losses["fb"].append(lfb)
                    ep_losses["ft"].append(lft)
                    ep_losses["temporal"].append(ltemp)
                    step = 1

        for k in ("fa", "fb", "ft", "temporal"):
            history[f"loss_{k}"].append(epoch_mean(ep_losses[k]))

        acc = float("nan")
        if epoch in p.val_array or epoch == epochs:
            # Anonymization preview grid (val_visualization_fa_vispr, :454-456).
            vis_imgs, _ = vispr_source.get_batch(list(range(min(4, len(vispr_source)))))
            save_vispr_visualization(
                fa_model, fa_vars, vis_imgs,
                os.path.join(save_dir, p.run_id, "visuals", f"epoch_{epoch}.png"),
                (p.reso_h, p.reso_w),
            )
            acc = evaluate_action(ft_eval, ft_vars, val_items, p, decode_hw=decode_hw, fa_vars=fa_vars)
            history["val_acc"].append(acc)
            best.maybe_save(
                acc, epoch,
                {"fa_model_state_dict": fa_vars, "fb_model_state_dict": fb_vars, "ft_model_state_dict": ft_vars},
            )
        payload = {
            "fa_model_state_dict": fa_vars,
            "fb_model_state_dict": fb_vars,
            "ft_model_state_dict": ft_vars,
            "epoch": epoch + 1,
        }
        save_temp(os.path.join(save_dir, p.run_id), "model", payload)
        if epoch % 3 == 0:  # optimizer states every 3rd epoch (train_anonymizer.py:539-550)
            # Async like save_temp/best: this is the LARGEST payload (3 models + 3
            # optimizer states) — a synchronous msgpack+disk write here would stall
            # every 3rd epoch's dispatch; durability comes from flush_checkpoints().
            async_writer().save(
                os.path.join(save_dir, p.run_id, f"model_{epoch}_full.ckpt"),
                {**payload, "opt_fa": st_fa, "opt_fb": st_fb, "opt_ft": st_ft},
            )
        writer.scalars(
            {
                "lr_fa": scale * p.learning_rate_fa,
                "loss_fa": history["loss_fa"][-1],
                "loss_fb": history["loss_fb"][-1],
                "loss_ft": history["loss_ft"][-1],
                "loss_temporal": history["loss_temporal"][-1],
                "val_acc": acc,
            },
            epoch,
        )
        log_fn(
            f"epoch {epoch}: fa {history['loss_fa'][-1]:.4f} fb {history['loss_fb'][-1]:.4f} "
            f"ft {history['loss_ft'][-1]:.4f} acc {acc:.4f} ({time.time() - t0:.1f}s)"
        )

    flush_checkpoints()  # drain async saves before artifacts are read back
    return {
        "history": history,
        "best_acc": best.best,
        "best_path": best.best_path,
        "fa_variables": fa_vars,
        "fb_variables": fb_vars,
        "ft_variables": ft_vars,
    }
