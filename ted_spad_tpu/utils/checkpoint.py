"""Checkpoint I/O with the reference's artifact semantics, on flax/orbax-style trees.

Reference semantics reproduced (SURVEY.md §5):
  - dict artifacts keyed ``{fa,fb,ft}_model_state_dict`` + ``epoch`` (+ optimizer states
    every 3rd epoch) (train_anonymizer.py:519-550);
  - rolling ``model_temp`` each epoch + explicit restart support (train_action.py:204-212,
    400-409);
  - best-metric gated saves (acc>0.6 anonymizer train_anonymizer.py:511; best cMAP
    train_privacy.py:219; best AUC/PR mgfn main.py:107-116).

Format: a msgpack file (flax.serialization) holding a dict of named pytrees — functionally
the ``torch.save`` dict, but framework-native and mmap-friendly. Paths use a ``.ckpt``
suffix in place of the reference's ``.pth``.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import flax.serialization
import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: str, payload: Mapping[str, Any]) -> str:
    """Atomically write a named-pytree dict (e.g. {'fa_model_state_dict': vars, 'epoch': 3}).

    ``to_state_dict`` first: optimizer states (optax namedtuples, including
    inject_hyperparams wrappers) become plain nested dicts msgpack can hold; restore with
    :func:`restore_like` against a live template."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(_to_host(dict(payload)))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def restore_like(template: Any, state: Any) -> Any:
    """Restore ``state`` (raw nested dicts from msgpack) into the structure/dtypes of
    ``template`` — the equivalent of ``load_state_dict(strict=True)``."""
    return flax.serialization.from_state_dict(template, state)


class BestCheckpointer:
    """Best-metric gated saving (e.g. ``model_{E}_bestAcc_{acc}`` train_anonymizer.py:518).

    With a ``threshold``, EVERY qualifying epoch is saved (the reference anonymizer writes
    a checkpoint for each validation epoch with acc > 0.6, train_anonymizer.py:511-525 —
    artifacts accumulate; downstream stages often want a later, more-anonymizing epoch).
    Without one, only strict improvements are saved. ``best_path`` always tracks the
    best-metric artifact."""

    def __init__(self, directory: str, name: str, mode: str = "max", threshold: float | None = None):
        self.directory = directory
        self.name = name
        self.mode = mode
        self.threshold = threshold
        self.best: float | None = None
        self.best_path: str | None = None

    def is_better(self, value: float) -> bool:
        if self.threshold is not None:
            # Threshold mode: qualify on the threshold alone (save-all-above semantics).
            return value > self.threshold if self.mode == "max" else value < self.threshold
        if self.best is None:
            return True
        return value > self.best if self.mode == "max" else value < self.best

    def maybe_save(self, value: float, epoch: int, payload: Mapping[str, Any]) -> str | None:
        if not self.is_better(value):
            return None
        improved = self.best is None or (value > self.best if self.mode == "max" else value < self.best)
        path = os.path.join(self.directory, f"{self.name}_{epoch}_best_{value:.4f}.ckpt")
        saved = save_checkpoint(path, {**payload, "epoch": epoch, "metric": value})
        if improved:
            self.best = value
            self.best_path = saved
        return saved


def save_temp(directory: str, name: str, payload: Mapping[str, Any]) -> str:
    """Rolling per-epoch checkpoint (``model_temp.pth`` equivalent, train_action.py:400-409)."""
    return save_checkpoint(os.path.join(directory, f"{name}_temp.ckpt"), payload)


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, multi-host-safe checkpointing for large runs.
# The msgpack format above stays the canonical single-host artifact; orbax adds
# non-blocking saves during training at production scale.
# ---------------------------------------------------------------------------


def orbax_checkpointer():
    """Create an async orbax checkpointer, or None if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp

        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    except Exception:  # noqa: BLE001
        return None


def save_checkpoint_orbax(checkpointer, path: str, payload: Mapping[str, Any]) -> str:
    """Non-blocking save of a pytree dict via orbax (multi-host coordinated)."""
    checkpointer.save(os.path.abspath(path), dict(payload), force=True)
    return path


def load_checkpoint_orbax(checkpointer, path: str, template: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    args = ocp.args.StandardRestore(template) if template is not None else None
    return checkpointer.restore(os.path.abspath(path), args=args)
