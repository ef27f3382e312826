"""fa pretraining: UNet/UNet++ identity reconstruction on UCF101-frames + VISPR images.

Reference: fa_pretraining/train_reconstruction.py (train_epoch:26, validation_epoch:61,
train_classifier:95). L1 loss (:111), Adam lr 1e-3, warmup + patience-based scheduled LR
drop (:138-161), best-val + rolling temp checkpoints with epoch/lr_counter state
(:178-196).

TPU redesign: decode on host -> device-side augmentation fused into the jitted train step
(augment + fa forward + L1 + Adam in one XLA program); batches sharded over the data mesh.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ted_spad_tpu.config.params import ReconstructionParams
from ted_spad_tpu.data.images import sample_image_augment_params
from ted_spad_tpu.data.prefetch import prefetch
from ted_spad_tpu.models import load_fa_model
from ted_spad_tpu.ops.augment import augment_batch, center_crop_resize
from ted_spad_tpu.ops.losses import l1_loss
from ted_spad_tpu.stages.common import LRScheduler, epoch_mean, make_optimizer, set_learning_rate
from ted_spad_tpu.utils.checkpoint import BestCheckpointer, flush_checkpoints, save_checkpoint, save_temp


def make_train_step(model, optimizer, out_hw: tuple[int, int]) -> Callable:
    out_h, out_w = out_hw

    # Donate params/opt-state: XLA updates them in place (no old+new copies in HBM).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(variables, opt_state, images_u8, aug_params):
        from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

        fast = make_fast_fa_apply(model, variables)  # fused decoder; module fallback
        # (B, S, S, 3) uint8 -> augmented f32 [0,1] on device, fused with the model fwd.
        aug = augment_batch(images_u8[:, None], aug_params, out_h, out_w)[:, 0]

        def loss_fn(params):
            vars_in = {**variables, "params": params}
            recon, mutated = fast(vars_in, aug, train=True, mutable=["batch_stats"])
            return l1_loss(recon, aug), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda p, u: p + u, variables["params"], updates)
        return {**variables, "params": params, **mutated}, opt_state, loss

    return train_step


def make_eval_step(model, out_hw: tuple[int, int]) -> Callable:
    out_h, out_w = out_hw

    @jax.jit
    def eval_step(variables, images_u8):
        from ted_spad_tpu.ops.fast_unetpp import make_fast_fa_apply

        img = center_crop_resize(images_u8[:, None], 1.0, out_h, out_w, no_ar_distortion=True)[:, 0]
        recon = make_fast_fa_apply(model, variables)(variables, img, train=False)
        return l1_loss(recon, img), recon, img

    return eval_step


def train_reconstruction(
    p: ReconstructionParams,
    *,
    train_source: Any,
    val_source: Any | None = None,
    save_dir: str = "saved_models",
    max_epochs: int | None = None,
    restart: bool = False,
    log_fn: Callable[[str], None] = print,
    seed: int = 0,
) -> dict[str, Any]:
    """Stage driver (train_reconstruction.py:95-216). Sources provide
    ``get_batch(indices) -> (images_u8, _)`` (file-backed or synthetic). ``restart``
    resumes from the rolling temp checkpoint with its epoch/lr_counter state
    (train_reconstruction.py:104-119 saved_model path)."""
    model, variables = load_fa_model(arch=p.arch_fa, image_size=(p.reso_h, p.reso_w), dtype=p.compute_dtype)
    optimizer = make_optimizer("adam", p.learning_rate)
    opt_state = optimizer.init(variables["params"])
    start_epoch = 1
    if restart:
        from ted_spad_tpu.utils.checkpoint import load_checkpoint, restore_like

        temp = os.path.join(save_dir, p.run_id, "model_temp.ckpt")
        if os.path.exists(temp):
            state = load_checkpoint(temp)
            variables = restore_like(variables, state["fa_model_state_dict"])
            start_epoch = int(state.get("epoch", 1))
            log_fn(f"restarted from {temp} at epoch {start_epoch}")
    train_step = make_train_step(model, optimizer, (p.reso_h, p.reso_w))
    eval_step = make_eval_step(model, (p.reso_h, p.reso_w))

    sched_params = p.replace(lr_scheduler="warmup_drop")
    sched = LRScheduler(sched_params)
    # Validation epochs (train_reconstruction.py:133).
    val_array = [1, 3, 5, 10, 12, 15, 20, 25, 30, 35, 40, 45] + [50 + x for x in range(100)]
    best = BestCheckpointer(os.path.join(save_dir, p.run_id), "model", mode="min")
    rng = np.random.default_rng(seed)
    epochs = max_epochs or p.num_epochs
    history = {"train_loss": [], "val_loss": []}
    src_size = train_source.get_batch([0])[0].shape[1]
    from ted_spad_tpu.utils.logging import MetricsWriter

    writer = MetricsWriter(save_dir, p.run_id)

    for epoch in range(start_epoch, epochs + 1):
        # Per-epoch crash-resilience: a bad epoch (corrupt batch, transient IO) logs its
        # traceback and the run continues (train_reconstruction.py:149-203).
        try:
            t0 = time.time()
            lr = sched.epoch_lr(epoch)
            opt_state = set_learning_rate(opt_state, lr)
            order = rng.permutation(len(train_source))
            losses = []

            def batch_gen():
                # Runs on the prefetch producer thread: image loads + aug sampling for
                # batch N+1 proceed while step N executes. Sequential generator, so the
                # rng call order (and thus determinism) matches the inline loop.
                for s in range(len(order) // p.batch_size):
                    idx = order[s * p.batch_size : (s + 1) * p.batch_size]
                    images, _ = train_source.get_batch(idx)
                    aug = sample_image_augment_params(rng, len(idx), src_size, p.reso_h, p.reso_w)
                    yield images, aug

            with prefetch(batch_gen()) as batch_it:
                for images, aug in batch_it:
                    variables, opt_state, loss = train_step(variables, opt_state, jnp.asarray(images), aug.to_device())
                    losses.append(loss)  # raw device scalar; synced once per epoch
            train_loss = epoch_mean(losses)
            sched.update(train_loss)
            history["train_loss"].append(train_loss)

            val_loss = float("nan")
            if val_source is not None and epoch in val_array:
                vlosses = []
                vorder = np.arange(len(val_source))
                for s in range((len(vorder) + p.batch_size - 1) // p.batch_size):  # full split
                    idx = vorder[s * p.batch_size : (s + 1) * p.batch_size]
                    if len(idx) == 0:
                        break
                    images, _ = val_source.get_batch(idx)
                    vl, *_ = eval_step(variables, jnp.asarray(images))
                    vlosses.append(vl)
                val_loss = epoch_mean(vlosses)
                history["val_loss"].append(val_loss)
                best.maybe_save(
                    val_loss, epoch, {"fa_model_state_dict": variables, "optimizer": None, "lr_counter": sched.patience_count}
                )
            save_temp(
                os.path.join(save_dir, p.run_id),
                "model",
                {"fa_model_state_dict": variables, "epoch": epoch + 1, "lr_counter": sched.patience_count},
            )
            writer.scalars({"lr": lr, "train_l1": train_loss, "val_l1": val_loss}, epoch)
            log_fn(
                f"epoch {epoch}: lr {lr:.2e} train_l1 {train_loss:.4f} val_l1 {val_loss:.4f} "
                f"({time.time() - t0:.1f}s)"
            )
        except Exception:  # noqa: BLE001 — match reference multi-day-run survival
            import traceback

            log_fn(f"epoch {epoch} failed; continuing:\n{traceback.format_exc()}")
            continue

    flush_checkpoints()  # drain async saves before artifacts are read back
    return {"history": history, "best_path": best.best_path, "variables": variables}
