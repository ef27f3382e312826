"""Privacy attack evaluation: train a fresh ResNet-50 multi-label privacy classifier on
(optionally anonymized) VISPR and report cMAP — lower cMAP after anonymization = better
privacy.

Reference: privacy_training/train_privacy.py (train_epoch:29, val_epoch:70,
train_classifier:136). Fresh (non-pretrained) resnet50 (:154), BCEWithLogits (:157), fa
frozen when ``anon`` (:148-151), metrics macro precision/recall/F1 + per-class & macro AP
(cMAP) (:104-119), best-cMAP checkpoint with prediction dicts (:227-236), warmup + patience
LR (params_privacy).

TPU redesign: augmentation + optional frozen-fa anonymization + fb forward + BCE fused in
one jitted step; fa freezing is ``lax.stop_gradient`` + eval-mode batch stats instead of
``requires_grad=False`` (:150-151).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.config.params import PrivacyParams
from ted_spad_tpu.data.images import vispr_batches
from ted_spad_tpu.data.prefetch import prefetch
from ted_spad_tpu.models import load_fa_model, load_fb_model
from ted_spad_tpu.ops.augment import augment_batch, center_crop_resize
from ted_spad_tpu.ops.losses import bce_with_logits_loss
from ted_spad_tpu.ops.metrics import macro_average_precision, multilabel_prf1
from ted_spad_tpu.stages.common import LRScheduler, epoch_mean, make_optimizer, set_learning_rate
from ted_spad_tpu.utils.checkpoint import BestCheckpointer, flush_checkpoints, save_temp


def make_steps(
    fb_model, fa_apply: Callable | None, optimizer, out_hw: tuple[int, int]
) -> tuple[Callable, Callable]:
    out_h, out_w = out_hw

    def maybe_anon(img):
        if fa_apply is None:
            return img
        return jax.lax.stop_gradient(fa_apply(img))  # frozen fa (train_privacy.py:48-51, 150-151)

    # Donate params/opt-state: XLA updates them in place (no old+new copies in HBM).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(variables, opt_state, images_u8, labels, aug_params):
        img = augment_batch(images_u8[:, None], aug_params, out_h, out_w)[:, 0]
        img = maybe_anon(img)

        def loss_fn(params):
            vars_in = {**variables, "params": params}
            logits, mutated = fb_model.apply(vars_in, img, train=True, mutable=["batch_stats"])
            return bce_with_logits_loss(logits, labels), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda x, u: x + u, variables["params"], updates)
        return {**variables, "params": params, **mutated}, opt_state, loss

    @jax.jit
    def eval_step(variables, images_u8, labels):
        img = center_crop_resize(images_u8[:, None], 1.0, out_h, out_w, no_ar_distortion=True)[:, 0]
        img = maybe_anon(img)
        logits = fb_model.apply(variables, img, train=False)
        loss = bce_with_logits_loss(logits, labels)
        return loss, jax.nn.sigmoid(logits.astype(jnp.float32))

    return train_step, eval_step


def train_privacy(
    p: PrivacyParams,
    *,
    train_source: Any,
    val_source: Any,
    save_dir: str = "saved_models",
    fa_variables: Any | None = None,
    fa_arch: str = "unet++",
    max_epochs: int | None = None,
    log_fn: Callable[[str], None] = print,
    seed: int = 0,
) -> dict[str, Any]:
    """Stage driver (train_privacy.py:136-260). ``p.anon`` runs every image through the
    frozen anonymizer first (pass ``fa_variables`` or ``p.saved_model`` checkpoint)."""
    fb_model, variables = load_fb_model(
        "r50", num_pa=p.num_pa, ssl=False, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype
    )
    fa_apply = None
    if p.anon:
        fa_model, fa_vars = load_fa_model(
            p.saved_model, arch=fa_arch, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype
        )
        if fa_variables is not None:
            fa_vars = fa_variables
        from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

        _fast_fa = make_fast_fa_apply(fa_model, fa_vars)
        fa_apply = lambda img: _fast_fa(fa_vars, img, train=False)

    optimizer = make_optimizer("adam", p.learning_rate)
    opt_state = optimizer.init(variables["params"])
    train_step, eval_step = make_steps(fb_model, fa_apply, optimizer, (p.reso_h, p.reso_w))

    # Reference LR control (train_privacy.py:197-213): warmup * lr / 5 ("pretrained
    # drop"), then divide by lr_reduce_factor whenever the non-improvement counter
    # exceeds lr_patience — the warmup_drop mode, at base lr/5.
    sched = LRScheduler(p.replace(lr_scheduler="warmup_drop", learning_rate=p.learning_rate / 5))
    best = BestCheckpointer(os.path.join(save_dir, p.run_id), "model", mode="max")
    epochs = max_epochs or p.num_epochs
    history = {"train_loss": [], "val_loss": [], "cmap": [], "f1": []}
    from ted_spad_tpu.utils.logging import MetricsWriter

    writer = MetricsWriter(save_dir, p.run_id)

    for epoch in range(1, epochs + 1):
        # Per-epoch crash-resilience (train_privacy.py:202-256): log and continue.
        try:
            t0 = time.time()
            lr = sched.epoch_lr(epoch)
            opt_state = set_learning_rate(opt_state, lr)
            losses = []
            # prefetch: the PIL image loads of batch N+1 run on a producer thread
            # while step N executes (closed on exception by the context manager).
            with prefetch(vispr_batches(
                train_source, p.batch_size, train=True, out_h=p.reso_h, out_w=p.reso_w, seed=seed + epoch
            )) as batch_it:
                for batch in batch_it:
                    variables, opt_state, loss = train_step(
                        variables, opt_state, jnp.asarray(batch.images), jnp.asarray(batch.labels), batch.params.to_device()
                    )
                    losses.append(loss)  # raw device scalar; synced once per epoch
            train_loss = epoch_mean(losses)
            sched.update(train_loss)
            history["train_loss"].append(train_loss)

            # Validation: full-split cMAP (train_privacy.py:70-119).
            all_scores, all_labels, vlosses = [], [], []
            with prefetch(vispr_batches(
                val_source, p.v_batch_size, train=False, out_h=p.reso_h, out_w=p.reso_w, drop_last=False
            )) as batch_it:
                for batch in batch_it:
                    vl, scores = eval_step(variables, jnp.asarray(batch.images), jnp.asarray(batch.labels))
                    vlosses.append(vl)
                    all_scores.append(np.asarray(scores))
                    all_labels.append(batch.labels)
            scores = np.concatenate(all_scores)
            labels = np.concatenate(all_labels)
            cmap, per_class = macro_average_precision(labels, scores)
            prec, rec, f1 = multilabel_prf1(labels, scores)
            history["val_loss"].append(epoch_mean(vlosses))
            history["cmap"].append(cmap)
            history["f1"].append(f1)

            saved = best.maybe_save(
                cmap,
                epoch,
                {
                    "fb_model_state_dict": variables,
                    "prediction_scores": scores,
                    "ground_truth": labels,
                    "per_class_ap": per_class,
                },
            )
            writer.scalars({"lr": lr, "train_loss": train_loss, "cmap": cmap, "f1": f1}, epoch)
            save_temp(os.path.join(save_dir, p.run_id), "model", {"fb_model_state_dict": variables, "epoch": epoch + 1})
            log_fn(
                f"epoch {epoch}: lr {lr:.2e} loss {train_loss:.4f} cMAP {cmap:.4f} "
                f"P/R/F1 {prec:.3f}/{rec:.3f}/{f1:.3f} ({time.time() - t0:.1f}s){' [saved]' if saved else ''}"
            )
        except Exception:  # noqa: BLE001 — match reference multi-day-run survival
            import traceback

            log_fn(f"epoch {epoch} failed; continuing:\n{traceback.format_exc()}")
            # Keep the per-epoch series positionally aligned even when the failure
            # hit after some appends (e.g. train_loss recorded, validation died):
            # consumers zip these lists by index.
            n = max(len(v) for v in history.values())
            for v in history.values():
                while len(v) < n:
                    v.append(float("nan"))
            continue

    flush_checkpoints()  # drain async saves before artifacts are read back
    return {"history": history, "best_cmap": best.best, "best_path": best.best_path, "variables": variables}
