"""R3D-18 — torchvision ``r3d_18`` equivalent, alternative ft arch 'r3d_18'.

Reference use: ``wrapper_r3d_18`` (aux_code/model_loaders.py:200-214) wraps the torchvision
video ResNet, moves its fc aside, and returns ``(pred, 512-d backbone feature)``.

Architecture (torchvision.models.video.resnet): stem conv (3,7,7) s(1,2,2) p(1,3,3) + BN +
ReLU; 4 layers of 2 full-3D BasicBlocks (Conv3DSimple, k=3^3) with channels 64/128/256/512
and stride (2,2,2) from layer2 on; global average pool; fc.

Layout: ``(B, T, H, W, C)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ted_spad_tpu.models.layers import ConvBN, global_avg_pool

Array = jax.Array


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        s = (self.stride,) * 3
        residual = x
        out = ConvBN(self.planes, (3, 3, 3), s, padding=[(1, 1)] * 3, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.planes, (3, 3, 3), padding=[(1, 1)] * 3, act=False, dtype=self.dtype, name="conv2")(out, train)
        if self.downsample:
            residual = ConvBN(self.planes, (1, 1, 1), s, act=False, dtype=self.dtype, name="downsample")(
                x, train
            )
        return nn.relu(out + residual)


class R3D18(nn.Module):
    """Returns ``(logits, 512-d feature)`` like wrapper_r3d_18 (model_loaders.py:211-214)."""

    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.stem = ConvBN(64, (3, 7, 7), (1, 2, 2), padding=[(1, 1), (3, 3), (3, 3)], dtype=self.dtype)
        blocks = []
        for li, planes in enumerate((64, 128, 256, 512)):
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                down = bi == 0 and li > 0
                blocks.append(BasicBlock3D(planes, stride, down, dtype=self.dtype))
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def features(self, x: Array, train: bool = False) -> Array:
        x = self.stem(x, train)
        for block in self.blocks:
            x = block(x, train)
        return global_avg_pool(x)  # (B, 512) f32

    def __call__(self, x: Array, train: bool = False) -> tuple[Array, Array]:
        feat = self.features(x, train)
        logits = self.fc(feat.astype(self.dtype)).astype(jnp.float32)
        return logits, feat

    def extract_features(self, x: Array, train: bool = False) -> Array:
        return self.features(x, train)
