"""Multi-host slice utilities.

The reference never scales past one process (SURVEY.md §2.4); this module provides the
standard JAX multi-host entry for when a stage runs across a TPU slice's hosts:
``jax.distributed.initialize`` + per-process data sharding helpers. On a single host every
function degrades to a no-op, so stage code can call them unconditionally.
"""

from __future__ import annotations

import jax

# Cluster-environment markers jax.distributed auto-detects from: TPU pod metadata,
# coordinator env, Slurm/OpenMPI launchers. If any is set, auto-init failure is real.
CLUSTER_MARKERS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX if requested (TPU pods auto-discover with no args).

    With no arguments, auto-discovery failure is only swallowed in the known
    single-process case (no cluster env configured) — a pod host that *should* have
    discovered its coordinator re-raises instead of silently degrading to one process.
    With explicit arguments, failures always raise."""
    if coordinator_address is None and num_processes is None:
        import os

        in_cluster = any(os.environ.get(k) for k in CLUSTER_MARKERS)
        try:
            jax.distributed.initialize()
        except Exception:  # noqa: BLE001
            if in_cluster:
                raise  # misconfigured coordinator on a real pod must not pass silently
            return  # known single-process dev environment
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
