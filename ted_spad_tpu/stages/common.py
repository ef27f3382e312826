"""Shared stage machinery: optimizer factories, LR schedulers, train-state utilities.

The reference sets the learning rate *per epoch* from python-side logic (warmup/cosine
arrays, patience drops — train_action.py:300-318, train_reconstruction.py:138-161). We keep
that host-side control plane, exposing the LR as an ``optax.inject_hyperparams`` field so
one jitted step serves every epoch (no recompiles on LR change).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_optimizer(
    opt_type: str = "adam",
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """torch-matching optimizers (train_anonymizer.py:377-388; train_action.py:221-226).

    torch Adam's ``weight_decay`` adds L2 to the gradient *before* the moment updates ->
    ``add_decayed_weights`` ahead of ``scale_by_adam``. AdamW decays decoupled (optax.adamw
    semantics). The LR is an injected hyperparam, mutable between steps without recompile.
    """

    def build(lr):
        if opt_type == "adam":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            return optax.chain(*core, optax.scale_by_adam(), optax.scale(-lr))
        if opt_type == "adamw":
            return optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(weight_decay),
                optax.scale(-lr),
            )
        if opt_type == "sgd":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            return optax.chain(*core, optax.trace(decay=momentum), optax.scale(-lr))
        raise ValueError(f"unknown opt_type {opt_type!r}")

    return optax.inject_hyperparams(lambda learning_rate: build(learning_rate))(
        learning_rate=learning_rate
    )


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected LR in an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class LRScheduler:
    """Host-side per-epoch LR control replicating the reference's four modes
    (train_action.py:300-318) plus the reconstruction stage's warmup+patience drop
    (train_reconstruction.py:138-161). Call :meth:`epoch_lr` before each epoch and
    :meth:`update` after it with the train loss."""

    def __init__(self, params):
        self.p = params
        self.base_lr = params.learning_rate
        self.best_loss = float("inf")
        self.patience_count = 0
        self.scheduler_step = 1
        self.lr = self.base_lr

    def epoch_lr(self, epoch: int, train_loss: float | None = None) -> float:
        p = self.p
        mode = getattr(p, "lr_scheduler", "cosine")
        if mode == "cosine":
            arr = p.cosine_lr_array
            self.lr = arr[min(epoch - 1, len(arr) - 1)] * self.base_lr
        elif mode != "warmup_drop" and getattr(p, "warmup", 0) and epoch - 1 < len(p.warmup_array):
            self.lr = p.warmup_array[epoch - 1] * self.base_lr
        elif mode == "loss_based" and train_loss is not None:
            if 0.5 <= train_loss < 1.0:
                self.lr = self.base_lr / 2
            elif 0.1 <= train_loss < 0.5:
                self.lr = self.base_lr / 10
            elif train_loss < 0.1:
                self.lr = self.base_lr / 20
        elif mode == "patience_based":
            if self.patience_count >= p.lr_patience:
                self.lr = self.base_lr / (p.lr_reduce_factor**self.scheduler_step)
                self.patience_count = 0
                self.scheduler_step += 1
        elif mode == "warmup_drop":
            # train_reconstruction.py:144 / train_privacy.py:197: warmup_array[epoch]
            # while epoch < warmup (1-based epoch skips index 0 — faithful), then divide
            # by the stage's drop factor once MORE THAN lr_patience non-improving epochs
            # have accumulated (scheduled_drop for reconstruction, lr_reduce_factor for
            # privacy). The count is CUMULATIVE, not consecutive — the reference never
            # resets the counter on improvement in these two loops (train_privacy.py:
            # 204-210, train_reconstruction.py:154-160), only after a drop fires;
            # update() mirrors that (reset-on-improve is patience_based-only).
            if epoch < getattr(p, "warmup", 0):
                self.lr = p.warmup_array[min(epoch, len(p.warmup_array) - 1)] * self.base_lr
            if self.patience_count > p.lr_patience:
                self.patience_count = 0
                drop = getattr(p, "scheduled_drop", None) or getattr(p, "lr_reduce_factor", 5)
                self.lr = self.lr / drop
        return self.lr

    def update(self, train_loss: float):
        if train_loss < self.best_loss:
            self.best_loss = train_loss
            if getattr(self.p, "lr_scheduler", "") == "patience_based":
                self.patience_count = 0
        else:
            self.patience_count += 1


@dataclasses.dataclass
class ModelState:
    """One model's mutable training state (variables = params + batch_stats)."""

    variables: Any
    opt_state: Any = None

    @property
    def params(self):
        return self.variables["params"]


def split_params(variables):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def merge_params(params, rest):
    return {"params": params, **rest}


def tree_finite(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.isfinite(leaf).all()) for leaf in leaves if hasattr(leaf, "dtype"))


def epoch_mean(losses) -> float:
    """Mean of per-step losses with the host sync deferred to epoch end.

    Training loops append the RAW device scalar each step — ``float(loss)`` inside
    the loop would force a device round-trip per step, defeating JAX's async
    dispatch (on a tunneled/remote device that serializes host<->device latency
    into every step). All values are fetched together here, once per epoch."""
    if not losses:
        return float("nan")
    return float(np.mean(jax.device_get(list(losses))))
