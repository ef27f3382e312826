"""Device mesh + sharding helpers.

The workload is data-parallel (largest model ~46M params, SURVEY.md §2.4): a 1-D ``data``
mesh covers every stage. Params/optimizer state are replicated; batch tensors are sharded on
their leading axis. XLA inserts the psum gradient all-reduce over ICI when the jitted train
step consumes sharded batches and produces replicated params — no hand-written collectives
needed at this scale (the DataParallel replacement, train_anonymizer.py:357-363).

Multi-host extension: with ``jax.process_count() > 1`` the same annotations hold; each host
feeds its local shard (input-pipeline sharding per dali_extraction.py:63-64 becomes
per-process file-list sharding — see stages/feature_extraction.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Sequence[jax.Device] | None = None, axis: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """device_put a host batch pytree with the leading axis split over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate params/opt-state pytrees across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the leading axis to a device-count multiple; returns (padded, validity mask).

    Keeps shapes static and divisible for sharding when the last batch is ragged —
    the drop-remainder alternative to torch's uneven DataParallel scatter.
    """
    n = batch.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return batch, np.ones(n, bool)
    pad = np.repeat(batch[-1:], target - n, axis=0)
    mask = np.zeros(target, bool)
    mask[:n] = True
    return np.concatenate([batch, pad], axis=0), mask
