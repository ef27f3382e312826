"""Multi-host slice utilities.

The reference never scales past one process (SURVEY.md §2.4); this module provides the
standard JAX multi-host entry for when a stage runs across a TPU slice's hosts:
``jax.distributed.initialize`` + per-process data sharding helpers. On a single host every
function degrades to a no-op, so stage code can call them unconditionally.
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX if requested (TPU pods auto-discover with no args).
    Safe to call on a single host (no-op when no coordinator is configured)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:  # noqa: BLE001 — single-process dev environment
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_shard() -> tuple[int, int]:
    """(shard_id, num_shards) for per-host input sharding — feeds
    ``extract_features(shard_id=..., num_shards=...)`` and file-list splits
    (the DALI shard_id/num_shards equivalent, dali_extraction.py:63-64)."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> int:
    """Per-host batch size for a host-sharded global batch."""
    n = jax.process_count()
    assert global_batch % n == 0, f"global batch {global_batch} not divisible by {n} hosts"
    return global_batch // n
