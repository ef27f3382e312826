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
import threading
from typing import Any, Mapping

import flax.serialization
import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def _write_atomic(path: str, state: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path: str, payload: Mapping[str, Any]) -> str:
    """Atomically write a named-pytree dict (e.g. {'fa_model_state_dict': vars, 'epoch': 3}).

    ``to_state_dict`` first: optimizer states (optax namedtuples, including
    inject_hyperparams wrappers) become plain nested dicts msgpack can hold; restore with
    :func:`restore_like` against a live template."""
    _write_atomic(path, flax.serialization.to_state_dict(_to_host(dict(payload))))
    return path


class AsyncCheckpointWriter:
    """Background msgpack writer: the device->host snapshot happens ON THE CALLER
    (so the next donated train step can't invalidate buffers mid-fetch), while the
    serialize + disk write — the per-epoch multi-second part at 100M-param scale —
    runs on a worker thread off the train loop. Saves to the same path supersede
    any queued one (rolling ``model_temp`` stays bounded); writes per path keep
    submission order; at most ``max_pending`` DISTINCT paths queue before save()
    blocks (backpressure — distinct-path best-ckpt snapshots are ~full-model-sized
    and must not accumulate ahead of a slow disk). ``flush()`` drains the queue and
    re-raises the first worker error (call before reading artifacts back or
    returning from a driver). An atexit hook drains best-effort on ANY process
    exit — an exception escaping a train loop cannot silently drop queued writes
    (errors there are printed to stderr rather than raised)."""

    def __init__(self, max_pending: int = 2):
        import atexit

        self._lock = threading.Condition()
        self._pending: dict[str, Any] = {}
        self._order: list[str] = []
        self._max_pending = max_pending
        self._inflight = 0
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        atexit.register(self._drain_at_exit)

    def save(self, path: str, payload: Mapping[str, Any]) -> str:
        # Snapshot NOW, with an explicit copy for host arrays: device arrays are
        # immutable (np.asarray materializes a fresh host buffer before the next
        # donated step can invalidate them), but a caller-held numpy buffer could
        # be mutated while the worker is still serializing.
        def conv(x):
            if isinstance(x, np.ndarray):
                return x.copy()
            return np.asarray(x) if hasattr(x, "shape") else x

        state = flax.serialization.to_state_dict(
            jax.tree_util.tree_map(conv, dict(payload))
        )
        with self._lock:
            # Same-path saves always supersede in place; a NEW path waits for queue
            # room (the synchronous writer's natural backpressure, ≥max_pending deep).
            while path not in self._pending and len(self._order) >= self._max_pending:
                self._lock.wait()
            if path not in self._pending:
                self._order.append(path)
            self._pending[path] = state
            self._lock.notify_all()
        return path

    def _drain_at_exit(self) -> None:
        try:
            self.flush()
        except BaseException as e:  # noqa: BLE001 — exit path: report, don't raise
            import sys

            print(f"AsyncCheckpointWriter: checkpoint write failed: {e!r}", file=sys.stderr)

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._order:
                    self._lock.wait()
                path = self._order.pop(0)
                state = self._pending.pop(path)
                self._inflight += 1
                self._lock.notify_all()  # a queue slot freed: unblock waiting save()
            try:
                _write_atomic(path, state)
            except BaseException as e:  # noqa: BLE001 — surfaced at flush()
                with self._lock:
                    if self._error is None:
                        self._error = e
            finally:
                with self._lock:
                    self._inflight -= 1
                    self._lock.notify_all()

    def flush(self) -> None:
        with self._lock:
            while self._order or self._inflight:
                self._lock.wait()
            if self._error is not None:
                err, self._error = self._error, None
                raise err


_async_writer: AsyncCheckpointWriter | None = None
_async_writer_lock = threading.Lock()


def async_writer() -> AsyncCheckpointWriter:
    """Process-wide background checkpoint writer (lazy singleton)."""
    global _async_writer
    with _async_writer_lock:
        if _async_writer is None:
            _async_writer = AsyncCheckpointWriter()
        return _async_writer


def flush_checkpoints() -> None:
    """Drain pending async saves (no-op if none were made). Drivers call this before
    returning so artifacts are durable and worker errors surface."""
    with _async_writer_lock:
        w = _async_writer
    if w is not None:
        w.flush()


def load_checkpoint(path: str) -> dict[str, Any]:
    flush_checkpoints()  # in-process read-after-write: drain pending async saves first
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
        # Background write: the host snapshot is taken here (donation-safe); the
        # serialize + disk IO happens off the train loop (flush_checkpoints drains).
        saved = async_writer().save(path, {**payload, "epoch": epoch, "metric": value})
        if improved:
            self.best = value
            self.best_path = saved
        return saved


def save_temp(directory: str, name: str, payload: Mapping[str, Any]) -> str:
    """Rolling per-epoch checkpoint (``model_temp.pth`` equivalent, train_action.py:400-409).
    Written asynchronously; saves to the same path supersede queued ones."""
    return async_writer().save(os.path.join(directory, f"{name}_temp.ckpt"), payload)


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
