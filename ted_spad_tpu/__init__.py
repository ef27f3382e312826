"""TPU-native rebuild of TeD-SPAD (ICCV 2023) — privacy-preserving video anomaly detection.

Reference implementation: UCF-CRCV/TeD-SPAD (PyTorch/CUDA). This package re-designs the same
capabilities for TPU hardware: flax/JAX models with XLA-fused convolutions, jitted train steps
sharded over a ``jax.sharding.Mesh`` (data-parallel over ICI), bf16 mixed precision, Pallas
fused preprocessing kernels, and a host-side C++ (FFmpeg) video decode layer replacing
NVIDIA DALI / decord.

Layout conventions (TPU-first, diverging from the reference's NCHW/NCTHW):
  - images: ``(B, H, W, C)`` float in [0, 1]
  - videos: ``(B, T, H, W, C)``
  - features: ``(B, D)`` / per-video ``(T_clips, D)`` ``.npy`` artifacts (reference-compatible)
"""

__version__ = "0.1.0"
