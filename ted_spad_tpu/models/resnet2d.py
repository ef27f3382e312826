"""2D ResNet family in flax: ResNet-50 (fb privacy model) and ResNet-18 (UNet++ encoder).

Reference roles:
  - ``build_resnet_predictor`` (aux_code/model_loaders.py:157-168): torchvision resnet50 with
    fc replaced -> ``num_pa`` multi-label privacy logits.
  - ``load_privacy_ssl`` (model_loaders.py:124-149): resnet50 minus fc + MLP projection head
    2048 -> 2048 -> 128, L2-normalized (SimCLR fb).
  - UNet++'s ``resnet18`` encoder, depth 4 (model_loaders.py:18-30).

Layout: NHWC. BN follows torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ted_spad_tpu.models.layers import ConvBN, global_avg_pool
from ted_spad_tpu.ops.losses import l2_normalize

Array = jax.Array


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3, expansion 1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.planes, (3, 3), padding=[(1, 1), (1, 1)], act=False, dtype=self.dtype, name="conv2")(out, train)
        if self.downsample:
            residual = ConvBN(
                self.planes, (1, 1), (self.stride, self.stride), act=False, dtype=self.dtype, name="downsample"
            )(x, train)
        return nn.relu(out + residual)


class Bottleneck2D(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1, expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        out = ConvBN(self.planes, (1, 1), dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv2")(out, train)
        out = ConvBN(self.planes * 4, (1, 1), act=False, dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            residual = ConvBN(
                self.planes * 4, (1, 1), (self.stride, self.stride), act=False, dtype=self.dtype, name="downsample"
            )(x, train)
        return nn.relu(out + residual)


class ResNet2D(nn.Module):
    """Generic torchvision-style ResNet backbone returning per-stage feature maps.

    ``stages`` indexes match smp's encoder convention: [input, stem(/2), layer1(/4),
    layer2(/8), layer3(/16), layer4(/32)][: depth+1].
    """

    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    depth: int = 5  # how many downsampling stages to run (4 for the UNet++ encoder)
    width: int = 64  # stem width; stage planes are width x (1, 2, 4, 8). Non-default
    # widths exist for mesh-semantics dryruns/tests (compile cost), not weight parity.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck2D
        expansion = 1 if self.block == "basic" else 4
        feats = [x]

        x = ConvBN(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], dtype=self.dtype, name="stem")(x, train)
        feats.append(x)
        if self.depth < 2:
            return feats
        # torchvision maxpool k3 s2 pad=1 (symmetric) — NOT TF-SAME, which pads only on
        # the trailing edge for even sizes; symmetric padding is required for pretrained
        # ImageNet weight parity.
        neg = jnp.finfo(x.dtype).min
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=neg)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        inplanes = self.width
        stage_planes = tuple(self.width * m for m in (1, 2, 4, 8))
        for stage, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            if stage + 2 > self.depth:
                break
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                down = i == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(planes, s, down, dtype=self.dtype, name=f"layer{stage + 1}_{i}")(x, train)
                inplanes = planes * expansion
            feats.append(x)
        return feats


class ResNet50Classifier(nn.Module):
    """fb privacy predictor: resnet50 + fc(num_classes) (model_loaders.py:157-168)."""

    num_classes: int = 7
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        feats = ResNet2D(
            block="bottleneck", layers=tuple(self.layers), depth=5, width=self.width,
            dtype=self.dtype, name="backbone",
        )(x, train)
        pooled = global_avg_pool(feats[-1])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)


class ResNet50SSL(nn.Module):
    """fb SimCLR model: resnet50 (fc=Identity) + MLP 2048->2048->relu->128, L2-norm
    (model_loaders.py:124-149). Returns the 128-d projection used by NT-Xent."""

    embedding_dim: int = 128
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        feats = ResNet2D(
            block="bottleneck", layers=tuple(self.layers), depth=5, width=self.width,
            dtype=self.dtype, name="backbone",
        )(x, train)
        h = global_avg_pool(feats[-1])
        z = nn.Dense(2048, dtype=self.dtype, name="proj_fc1")(h)
        z = nn.relu(z)
        z = nn.Dense(self.embedding_dim, dtype=self.dtype, name="proj_fc2")(z)
        return l2_normalize(z.astype(jnp.float32), axis=-1)
