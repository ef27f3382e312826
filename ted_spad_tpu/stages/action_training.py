"""Action (utility) model training: ft on UCF101 clips, plain or through a frozen
anonymizer.

Reference: action_training/train_action.py (train_epoch:28, val_epoch:107,
train_classifier:189) and train_anonymized_action.py (same skeleton, every batch passed
through frozen fa first, :53-58 train / :135-140 val — utility-after-anonymization eval).

Semantics kept:
  - CE loss + optional temporal loss: 'trip' triplet on the 128-d mlp embeddings of
    (anchor, same-frames positive, shifted negative) or 'con' NT-Xent on two views
    (train_action.py:54-77);
  - FrozenBN during largei3d fine-tune (train_action.py:39-41) via ``frozen_bn=True``;
  - AMP autocast+GradScaler (:53, 79-81, 228) -> bf16 compute, no loss scaling needed;
  - validation sweep over modes x cropping factors with per-video softmax averaging
    (:330-381), best-acc checkpoint (:383-398) + rolling temp with restart (:204-212,
    400-409).

TPU redesign: decode on host threads; augmentation + (optional frozen fa) + ft forward +
loss + optimizer update all in one jitted XLA program, batch sharded over the data mesh.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.config.params import ActionParams
from ted_spad_tpu.data.prefetch import prefetch
from ted_spad_tpu.data.videos import ClipDataset, ValClipDataset
from ted_spad_tpu.models import load_fa_model, load_ft_model
from ted_spad_tpu.ops.augment import augment_batch, center_crop_resize
from ted_spad_tpu.ops.losses import (
    cross_entropy_loss,
    l2_normalize,
    nt_xent_loss,
    supcon_loss,
    triplet_margin_loss,
)
from ted_spad_tpu.ops.metrics import top1_accuracy
from ted_spad_tpu.stages.common import LRScheduler, epoch_mean, make_optimizer, set_learning_rate
from ted_spad_tpu.utils.checkpoint import (
    BestCheckpointer,
    flush_checkpoints,
    load_checkpoint,
    restore_like,
    save_temp,
)


def _apply_fa_frames(fa_model, fa_vars, video: jnp.ndarray, quirk: bool = False) -> jnp.ndarray:
    """Frozen per-frame anonymization of (..., T, H, W, C) video. ``quirk`` reproduces
    the reference's scrambled fa input (train_anonymized_action.py:47-58 and the val
    path train_anonymizer.py:240-243): fa sees 3-slice (C,T)-linear bundles instead
    of RGB frames; default is the clean layout (documented divergence)."""
    from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

    lead = video.shape[:-3]
    if quirk and len(lead) == 2:
        from ted_spad_tpu.ops.temporal import (
            scrambled_frame_view_jnp,
            unscrambled_frame_view_jnp,
        )

        b, t = lead
        frames = scrambled_frame_view_jnp(video)
        out = make_fast_fa_apply(fa_model, fa_vars)(fa_vars, frames, train=False)
        return jax.lax.stop_gradient(unscrambled_frame_view_jnp(out, b, t))
    frames = video.reshape((-1,) + video.shape[-3:])
    out = make_fast_fa_apply(fa_model, fa_vars)(fa_vars, frames, train=False)
    return jax.lax.stop_gradient(out.reshape(lead + out.shape[-3:]))


def make_train_step(ft_model, optimizer, p: ActionParams, fa=None) -> Callable:
    from ted_spad_tpu.ops.fast_i3d import make_fast_ft_train_forward

    frozen_bn = p.arch == "largei3d"  # train_action.py:39-41
    temporal = p.temporal_loss
    use_supcon = p.loss == "con"  # SupCon on stacked normalized view feats (train_action.py:60-65)
    # s2d fast stem in TRAIN mode for largei3d (exact tap re-binning; grads chain
    # through the linear transform) — module apply for the other archs.
    ft_fwd = make_fast_ft_train_forward(ft_model)

    # Donate params/opt-state: XLA updates them in place (no old+new copies in HBM).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(variables, opt_state, rng, clips_u8, labels, aug_params):
        b, v = clips_u8.shape[:2]
        flat = clips_u8.reshape((b * v,) + clips_u8.shape[2:])
        aug = augment_batch(flat, aug_params, p.reso_h, p.reso_w)  # (B*V, T, h, w, C)
        if fa is not None:
            if getattr(p, "quirk_compat", False):
                # Views concat on T before the scrambled reshape (train_anonymizer.py:93).
                tv = aug.reshape((b, v * aug.shape[1]) + aug.shape[2:])
                tv = _apply_fa_frames(fa[0], fa[1], tv, quirk=True)
                aug = tv.reshape((b * v,) + aug.shape[1:])
            else:
                aug = _apply_fa_frames(fa[0], fa[1], aug)
        aug = aug.reshape((b, v) + aug.shape[1:])

        def loss_fn(params):
            vars_in = {**variables, "params": params}

            def fwd(x, mutable):
                # frozen_bn only reaches the largei3d wrapper (train_action.py:39-41
                # applies freeze_bn to largei3d only); make_fast_ft_train_forward's
                # module fallback omits the kwarg for archs that don't accept it.
                return ft_fwd(vars_in, x, rng=rng, frozen_bn=frozen_bn)

            if v > 1:
                # One batched forward over all views keeps the MXU busy (vs v calls).
                out, mutated = fwd(aug.reshape((b * v,) + aug.shape[2:]), ["batch_stats"])
                logits, feats = out
                logits = logits.reshape(b, v, -1)[:, 0]
                feats = feats.reshape(b, v, -1)
                if use_supcon:
                    loss = supcon_loss(l2_normalize(feats[:, :2], axis=-1), labels)
                else:
                    loss = cross_entropy_loss(logits, labels)
                if temporal == "trip":
                    loss = loss + p.temporal_loss_weight * triplet_margin_loss(
                        feats[:, 0], feats[:, 1], feats[:, 2], margin=p.triplet_loss_margin
                    )
                elif temporal == "con":
                    loss = loss + p.temporal_loss_weight * nt_xent_loss(feats[:, 0], feats[:, 1])
            else:
                out, mutated = fwd(aug[:, 0], ["batch_stats"])
                logits, _ = out
                loss = cross_entropy_loss(logits, labels)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda x, u: x + u, variables["params"], updates)
        return {**variables, "params": params, **mutated}, opt_state, loss

    return train_step


def make_eval_step(
    ft_model, p: ActionParams, fa=None, three_crop: bool = False, fa_model=None
) -> Callable:
    """Per-view softmax. ``three_crop`` adds two corner crops to the center view and
    averages (ucf101_dl.py:297-320 threeCrop TTA; the reference five-crops the already
    center-cropped image — here the corners are taken at the crop factor on the full
    frame, the evident intent).

    Two anonymizer modes: ``fa=(model, vars)`` bakes frozen fa weights into the program
    (action eval — fa never changes); ``fa_model=...`` makes fa weights a *runtime
    argument* (``eval_step(variables, clips, cf, hflip, fa_vars=...)``) so the anonymizer
    stage's per-epoch fa snapshots don't trigger recompiles."""

    from ted_spad_tpu.ops.fast_i3d import make_fast_ft_forward

    ft_forward = make_fast_ft_forward(ft_model)  # s2d fast stem; module fallback

    quirk = getattr(p, "quirk_compat", False)

    def one_view(variables, img, hflip, fa_vars):
        if hflip:
            img = img[..., :, ::-1, :]
        view = img
        if fa is not None:
            view = _apply_fa_frames(fa[0], fa[1], view, quirk=quirk)
        elif fa_model is not None and fa_vars is not None:
            view = _apply_fa_frames(fa_model, fa_vars, view, quirk=quirk)
        logits, _ = ft_forward(variables, view, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def eval_step(variables, clips_u8, cropping_factor, hflip, fa_vars=None):
        # clips_u8: (B, 1, T, H, W, C); crops + resize on device.
        # cropping_factor == 1 evaluates at reso/0.8 (e.g. 280 for 224) with no crop —
        # the reference's output_reso quirk (ucf101_dl.py:229-234).
        if cropping_factor == 1:
            out_h, out_w = int(p.reso_h / 0.8), int(p.reso_w / 0.8)
        else:
            out_h, out_w = p.reso_h, p.reso_w
        img = clips_u8[:, 0].astype(jnp.float32) / 255.0
        center = center_crop_resize(img, cropping_factor, out_h, out_w)
        probs = one_view(variables, center, hflip, fa_vars)
        if three_crop and cropping_factor < 1.0:
            h, w = img.shape[-3], img.shape[-2]
            ch, cw = int(h * cropping_factor), int(w * cropping_factor)
            tl = img[..., :ch, :cw, :]
            br = img[..., h - ch :, w - cw :, :]
            for corner in (tl, br):
                view = jax.image.resize(
                    corner, (*corner.shape[:-3], p.reso_h, p.reso_w, corner.shape[-1]),
                    method="linear", antialias=True,
                )
                probs = probs + one_view(variables, view, hflip, fa_vars)
            probs = probs / 3.0
        return probs

    return jax.jit(eval_step, static_argnames=("cropping_factor", "hflip"))


def evaluate_action(
    eval_step: Callable,
    variables: Any,
    items,
    p: ActionParams,
    *,
    decode_hw: tuple[int, int] = (0, 0),
    fa_vars: Any | None = None,
) -> float:
    """Mode x crop x hflip sweep with per-video softmax averaging (train_action.py:330-381).

    Each video decodes ONCE per mode; the cropping_factor x hflip TTA views all run from
    the cached uint8 batch on device (the reference re-pulls the loader per view,
    multiplying host decode by ~len(cropping_facs)*len(hflip))."""
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    labels: dict[int, int] = {}
    # One dataset (and one decode thread pool) reused across the mode sweep — `mode`
    # is only read inside _load_one, and batches() drains its pool tasks per call.
    ds = ValClipDataset(items, p, mode=0, decode_w=decode_hw[1], decode_h=decode_hw[0])
    def _scored_batches():
        for mode in range(p.num_modes):
            ds.mode = mode
            yield from ds.batches(p.v_batch_size)

    # prefetch: the next batch decodes while the cf x hflip TTA sweep runs on device.
    with prefetch(_scored_batches()) as batch_it:
        for batch in batch_it:
            clips = jnp.asarray(batch.clips)  # one host->device transfer per batch
            for cf in p.cropping_facs:
                for hf in p.hflip:
                    probs = np.asarray(
                        eval_step(
                            variables, clips,
                            cropping_factor=float(cf), hflip=bool(hf), fa_vars=fa_vars,
                        )
                    )
                    for k, vid_idx in enumerate(batch.indices):
                        vid_idx = int(vid_idx)
                        sums[vid_idx] = sums.get(vid_idx, 0) + probs[k]
                        counts[vid_idx] = counts.get(vid_idx, 0) + 1
                        labels[vid_idx] = int(batch.labels[k])
    vids = sorted(sums)
    mean_probs = np.stack([sums[v] / counts[v] for v in vids])
    return top1_accuracy(mean_probs, np.asarray([labels[v] for v in vids]))


def train_action(
    p: ActionParams,
    *,
    train_items,
    val_items,
    save_dir: str = "saved_models",
    fa_variables: Any | None = None,
    max_epochs: int | None = None,
    decode_hw: tuple[int, int] = (0, 0),
    mesh=None,
    log_fn: Callable[[str], None] = print,
    seed: int = 0,
) -> dict[str, Any]:
    """Stage driver for both train_action.py:189 and (with ``p.anonymized``)
    train_anonymized_action.py:204."""
    ft_model, variables = load_ft_model(
        p.arch, p.saved_model, num_classes=p.num_classes,
        clip_shape=(p.num_frames, p.reso_h, p.reso_w), dtype=p.compute_dtype,
        dropout_rate=p.ft_dropout if p.ft_dropout else None,
    )
    fa = None
    if p.anonymized:
        fa_model, fa_vars = load_fa_model(
            p.saved_model_fa, arch=p.arch_fa, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype
        )
        if fa_variables is not None:
            fa_vars = fa_variables
        fa = (fa_model, fa_vars)

    optimizer = make_optimizer(p.opt_type, p.learning_rate, p.weight_decay, p.momentum)
    opt_state = optimizer.init(variables["params"])
    if mesh is not None:
        # Replicate params/opt-state once; per-step batches are device_put sharded below
        # and GSPMD propagates the layout through the jitted step (DP over ICI).
        from ted_spad_tpu.parallel import replicate

        variables = replicate(mesh, variables)
        opt_state = replicate(mesh, opt_state)
        if fa is not None:
            fa = (fa[0], replicate(mesh, fa[1]))

    # Restart-from-temp (train_action.py:204-212).
    start_epoch = 1
    temp_path = os.path.join(save_dir, p.run_id, "model_temp.ckpt")
    if p.restart and os.path.exists(temp_path):
        state = load_checkpoint(temp_path)
        variables = restore_like(variables, state["ft_model_state_dict"])
        start_epoch = int(state.get("epoch", 1))
        log_fn(f"restarted from {temp_path} at epoch {start_epoch}")

    if p.eval_only:
        # Evaluation-only mode (params_action eval_only flag): mode-x-crop sweep, no training.
        eval_step = make_eval_step(ft_model, p, fa, three_crop=p.three_crop)
        acc = evaluate_action(eval_step, variables, val_items, p, decode_hw=decode_hw)
        log_fn(f"eval_only top-1: {acc:.4f}")
        return {"history": {"train_loss": [], "val_acc": [acc]}, "best_acc": acc,
                "best_path": None, "variables": variables}

    # View count: trip needs (anchor, positive, negative); loss='con' or temporal 'con'
    # need 2 views (train_action.py / ucf101_dl contrastive loaders).
    views = 3 if p.temporal_loss == "trip" else (2 if (p.loss == "con" or p.temporal_loss == "con") else 1)
    train_ds = ClipDataset(
        train_items, p, views=views, data_percentage=p.data_percentage,
        decode_w=decode_hw[1], decode_h=decode_hw[0], seed=seed,
    )
    train_step = make_train_step(ft_model, optimizer, p, fa)
    eval_step = make_eval_step(ft_model, p, fa, three_crop=p.three_crop)

    sched = LRScheduler(p)
    best = BestCheckpointer(os.path.join(save_dir, p.run_id), "model", mode="max")
    rng = jax.random.PRNGKey(seed)
    epochs = max_epochs or p.num_epochs
    history = {"train_loss": [], "val_acc": []}
    train_loss = float("nan")
    from ted_spad_tpu.utils.logging import MetricsWriter

    writer = MetricsWriter(save_dir, p.run_id)

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        lr = sched.epoch_lr(epoch, train_loss)
        opt_state = set_learning_rate(opt_state, lr)
        losses = []
        # prefetch: decode of batch N+1 (the pool.map straggler tail) runs on a
        # producer thread while step N executes — off the dispatch critical path.
        with prefetch(train_ds.batches(p.batch_size, seed=seed + epoch)) as batch_it:
            for batch in batch_it:
                rng, step_rng = jax.random.split(rng)
                clips, labels, aug = jnp.asarray(batch.clips), jnp.asarray(batch.labels), batch.params.to_device()
                if mesh is not None and batch.clips.shape[0] % mesh.devices.size == 0:
                    from ted_spad_tpu.parallel import shard_batch

                    clips, labels, aug = shard_batch(mesh, (clips, labels, aug))
                variables, opt_state, loss = train_step(variables, opt_state, step_rng, clips, labels, aug)
                losses.append(loss)  # raw device scalar; synced once per epoch (epoch_mean)
        train_loss = epoch_mean(losses)
        sched.update(train_loss)
        history["train_loss"].append(train_loss)

        acc = float("nan")
        if epoch in p.val_array or epoch == epochs:
            acc = evaluate_action(eval_step, variables, val_items, p, decode_hw=decode_hw)
            history["val_acc"].append(acc)
            best.maybe_save(acc, epoch, {"ft_model_state_dict": variables})
        save_temp(os.path.join(save_dir, p.run_id), "model", {"ft_model_state_dict": variables, "epoch": epoch + 1})
        writer.scalars({"lr": lr, "train_loss": train_loss, "val_acc": acc}, epoch)
        log_fn(
            f"epoch {epoch}: lr {lr:.2e} loss {train_loss:.4f} acc {acc:.4f} ({time.time() - t0:.1f}s)"
        )

    flush_checkpoints()  # drain async saves before artifacts are read back
    return {"history": history, "best_acc": best.best, "best_path": best.best_path, "variables": variables}
