"""Parallelism layer: device mesh construction + sharding-annotated train steps.

Replaces the reference's single-process ``nn.DataParallel`` scatter/gather
(train_anonymizer.py:357-363 etc., SURVEY.md §2.4) with JAX SPMD: params replicated,
batches sharded over the mesh's ``data`` axis, gradient all-reduce riding ICI collectives
inserted by XLA.
"""

from ted_spad_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_parallel_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
