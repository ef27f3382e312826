"""MGFN anomaly-detection stage: weakly-supervised train + frame-level AUC eval.

Reference: anomaly_detection_mgfn/main.py (driver), train.py (loss/step), test.py (eval).

TPU-first redesign:
  - one jitted ``train_step`` (loss + grads + Adam update fused by XLA) instead of the
    python loss assembly per batch (train.py:86-107);
  - test videos run through static-length buckets with validity masks (exact — see
    models/mgfn.py) so XLA compiles a handful of programs, not one per video length;
  - data parallelism via ``jax.sharding``: batches sharded over the mesh's data axis,
    params replicated (replaces single-GPU training; the model is tiny so DP suffices).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ted_spad_tpu.config.params import MGFNParams
from ted_spad_tpu.data.prefetch import prefetch
from ted_spad_tpu.data.features import (
    FeatureDataset,
    TestFeatureDataset,
    padded_test_batch,
    paired_train_batches,
)
from ted_spad_tpu.models import load_mgfn_model
from ted_spad_tpu.ops.losses import mgfn_loss, smoothness_loss, sparsity_loss
from ted_spad_tpu.ops.metrics import frame_level_scores, pr_auc, roc_auc
from ted_spad_tpu.utils.checkpoint import BestCheckpointer, flush_checkpoints, save_checkpoint


@dataclasses.dataclass
class TrainState:
    variables: Any  # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: int = 0


def make_optimizer(p: MGFNParams) -> optax.GradientTransformation:
    # Adam lr 1e-3, weight_decay 5e-4 (main.py:72). torch Adam's weight_decay is L2-added-
    # to-grad, i.e. optax.add_decayed_weights *before* the Adam transform. LR is injected
    # so the per-epoch schedule list (config.py:6, main.py:91-93) mutates without recompile.
    def build(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(p.weight_decay),
            optax.scale_by_adam(),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(build)(learning_rate=p.lr)


def make_train_step(model, optimizer, p: MGFNParams, mesh=None) -> Callable:
    """Jitted step over a combined [normal; abnormal] batch (train.py:82-107).

    With ``mesh`` (1-D), the normal/abnormal half-batches are sharded on their leading
    axis and params/opt-state stay replicated; XLA inserts the psum gradient all-reduce
    over ICI (the DataParallel replacement, SURVEY.md §2.4)."""
    jit_kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(axis))
        jit_kw = dict(
            in_shardings=(rep, rep, rep, sh, sh, sh, sh),
            out_shardings=(rep, rep, rep),
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1), **jit_kw)
    def train_step(state_vars, opt_state, rng, nfeat, nlabel, afeat, alabel):
        batch = nfeat.shape[0]
        video = jnp.concatenate([nfeat, afeat], axis=0)  # (2B, ncrops, 32, F+1)

        def loss_fn(params):
            variables = {**state_vars, "params": params}
            outs, mutated = model.apply(
                variables,
                video,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            score_abnormal, score_normal, abn_fm, nor_fm, scores = outs
            # scores: (2B, 32, 1) -> abnormal snippet scores (train.py:88-91).
            abn_scores = scores.reshape(-1)[batch * scores.shape[1] :]
            loss = (
                mgfn_loss(
                    score_normal,
                    score_abnormal,
                    nlabel,
                    alabel,
                    nor_fm,
                    abn_fm,
                    margin=p.contrastive_margin,
                )
                + smoothness_loss(abn_scores, p.lambda_smooth)
                + sparsity_loss(abn_scores, p.lambda_sparse)
            )
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state_vars["params"])
        updates, opt_state = optimizer.update(grads, opt_state, state_vars["params"])
        params = optax.apply_updates(state_vars["params"], updates)
        new_vars = {**state_vars, "params": params, **mutated}
        return new_vars, opt_state, loss

    return train_step


def make_score_fn(model, mesh=None) -> Callable:
    """Jitted batched scorer: (B, ncrops, Tb, F+1) + mask (B, Tb) -> (B, Tb) crop-mean
    scores. Masked bucket padding keeps results bit-exact vs per-video native length
    (models/mgfn.py), so same-bucket videos batch freely.

    With ``mesh``, the eval batch is sharded over the data axis and params replicated,
    so per-epoch test scoring scales with training instead of becoming the serial tail."""
    jit_kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(axis))
        jit_kw = dict(in_shardings=(rep, sh, sh), out_shardings=sh)

    @functools.partial(jax.jit, **jit_kw)
    def score_fn(variables, video, mask):
        *_, scores = model.apply(variables, video, train=False, inference=True, mask=mask)
        return scores[:, :, 0]  # (B, Tb)

    return score_fn


def evaluate(
    score_fn: Callable,
    variables: Any,
    test_ds: TestFeatureDataset,
    gt: np.ndarray,
    bucket_multiple: int = 64,
    eval_batch: int = 8,
    frames_per_clip: int = 32,
) -> tuple[float, float]:
    """Frame-level ROC/PR AUC over the concatenated test set (test.py:13-51).

    Videos are grouped by bucket length (header-only shape peeks — no data load) and their
    features stream through in ``eval_batch`` chunks, so host memory stays O(eval_batch)
    instead of the whole padded test set — a throughput+memory rewrite of the reference's
    one-video-per-step loop (batch_size=1, main.py:55-57); list order is restored before
    concatenation."""
    from ted_spad_tpu.data.features import bucket_length

    by_bucket: dict[tuple[int, int], list[int]] = {}
    for i in range(len(test_ds)):
        shape = test_ds.peek_shape(i)
        t = shape[0]
        ncrops = shape[1] if len(shape) == 3 else 1
        by_bucket.setdefault((bucket_length(t, bucket_multiple), ncrops), []).append(i)

    def _chunks():
        # Runs on the prefetch producer thread: the .npy feature loads + pad/concat
        # of chunk N+1 (the IO-heavy part — full 10-crop test features per epoch)
        # overlap the device scoring of chunk N.
        for indices in by_bucket.values():
            for s in range(0, len(indices), eval_batch):
                chunk_ids = indices[s : s + eval_batch]
                chunk = []
                for i in chunk_ids:
                    feats, _ = test_ds[i]
                    video, mask, t = padded_test_batch(feats, bucket_multiple)
                    chunk.append((i, video, mask, t))
                video = np.concatenate([c[1] for c in chunk], axis=0)
                mask = np.concatenate([c[2] for c in chunk], axis=0)
                # Pad the batch to eval_batch for a stable compile count per bucket.
                pad = eval_batch - video.shape[0]
                if pad:
                    video = np.concatenate([video, np.repeat(video[-1:], pad, axis=0)])
                    mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
                yield chunk, video, mask

    results: dict[int, np.ndarray] = {}
    with prefetch(_chunks()) as chunk_it:
        for chunk, video, mask in chunk_it:
            scores = np.asarray(score_fn(variables, video, mask))
            for row, (i, _, _, t) in enumerate(chunk):
                results[i] = scores[row, :t]
    clip_scores = np.concatenate([results[i] for i in range(len(test_ds))])
    pred = frame_level_scores(clip_scores, len(gt), frames_per_clip=frames_per_clip)
    return roc_auc(gt, pred), pr_auc(gt, pred)


def train_anomaly_detection(
    p: MGFNParams,
    *,
    save_dir: str = "ckpt",
    gt: np.ndarray | None = None,
    max_epochs: int | None = None,
    shuffle: bool = False,
    mesh=None,
    log_fn: Callable[[str], None] = print,
    data_root: str | None = None,
) -> dict[str, Any]:
    """Full stage driver (main.py:30-117). Returns summary with best metrics/paths."""
    normal_ds = FeatureDataset(p.rgb_list, p.datasetname, is_normal=True, seg_length=p.seg_length, root=data_root)
    abnormal_ds = FeatureDataset(p.rgb_list, p.datasetname, is_normal=False, seg_length=p.seg_length, root=data_root)
    test_ds = TestFeatureDataset(p.test_rgb_list, p.datasetname, root=data_root)
    if gt is None:
        gt = np.load(p.gt)

    sample_feats, _ = normal_ds[0]
    ncrops = sample_feats.shape[0]
    if mesh is not None and p.batch_size % mesh.devices.size != 0:
        log_fn(
            f"mesh disabled: batch_size {p.batch_size} not divisible by "
            f"{mesh.devices.size} devices"
        )
        mesh = None
    model, variables = load_mgfn_model(p, ncrops=ncrops)
    optimizer = make_optimizer(p)
    opt_state = optimizer.init(variables["params"])
    train_step = make_train_step(model, optimizer, p, mesh=mesh)
    score_fn = make_score_fn(model, mesh=mesh)
    # Eval batch must land one-or-more whole rows per device when sharded.
    eval_batch = 8 if mesh is None else max(8 // mesh.devices.size, 1) * mesh.devices.size

    # Best-ckpt selection: PR AUC for XD, ROC AUC otherwise (main.py:107-116).
    select_pr = p.datasetname == "XD"
    best = BestCheckpointer(save_dir, p.model_name, mode="max")
    rng = jax.random.PRNGKey(p.seed)
    epochs = max_epochs or p.max_epoch
    history = {"epoch": [], "test_AUC": [], "test_PR": [], "loss": []}

    from ted_spad_tpu.stages.common import epoch_mean, set_learning_rate
    from ted_spad_tpu.utils.logging import MetricsWriter

    writer = MetricsWriter(save_dir, p.model_name)
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        if p.lr_schedule:
            opt_state = set_learning_rate(opt_state, p.lr_schedule[min(epoch - 1, len(p.lr_schedule) - 1)])
        loss_val = float("nan")
        # prefetch: feature .npy loads + 32-seg pooling of batch N+1 run on a
        # producer thread while step N executes.
        with prefetch(paired_train_batches(
            normal_ds, abnormal_ds, p.batch_size, shuffle=shuffle, seed=p.seed + epoch
        )) as batch_it:
            for batch in batch_it:
                rng, step_rng = jax.random.split(rng)
                variables, opt_state, loss = train_step(variables, opt_state, step_rng, *map(jnp.asarray, batch))
                loss_val = loss  # raw device scalar; synced after the loop
        auc_roc, auc_pr = evaluate(
            score_fn, variables, test_ds, gt,
            eval_batch=eval_batch, frames_per_clip=p.frames_per_clip,
        )
        history["epoch"].append(epoch)
        history["test_AUC"].append(auc_roc)
        history["test_PR"].append(auc_pr)
        loss_val = epoch_mean([loss_val]) if loss_val is not None else float("nan")
        history["loss"].append(loss_val)
        writer.scalars({"loss": loss_val, "roc_auc": auc_roc, "pr_auc": auc_pr}, epoch)
        metric = auc_pr if select_pr else auc_roc
        saved = best.maybe_save(metric, epoch, {"mgfn_model_state_dict": variables})
        if saved:
            # Best-record artifact (save_best_record, utils/utils.py:94-99).
            writer.text(f"best_record_epoch_{epoch}",
                        f"epoch: {epoch}\ntest_AUC: {auc_roc}\ntest_PR: {auc_pr}\n")
        log_fn(
            f"epoch {epoch}: loss {loss_val:.4f} roc_auc {auc_roc:.4f} pr_auc {auc_pr:.4f} "
            f"({time.time() - t0:.1f}s){' [saved]' if saved else ''}"
        )

    final_path = save_checkpoint(
        os.path.join(save_dir, f"{p.model_name}_final.ckpt"), {"mgfn_model_state_dict": variables}
    )
    flush_checkpoints()  # drain async best-ckpt saves before artifacts are read back
    return {
        "history": history,
        "best_metric": best.best,
        "best_path": best.best_path,
        "final_path": final_path,
        "variables": variables,
    }
