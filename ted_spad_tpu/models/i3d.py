"""InceptionI3d (Inception-v1 inflated 3D) — alternative ft arch 'i3d'.

Reference: aux_code/models/i3d.py (InceptionI3d:152, Unit3D:48, InceptionModule:124,
MaxPool3dSamePadding:13). TF-style *dynamic* SAME padding is preserved exactly — it differs
from XLA 'SAME' only in max-pool edge handling when stride divides size, so we compute the
explicit pads at trace time (shapes are static under jit).

forward (i3d.py:324-333): endpoints -> adaptive avgpool (1,1,1) -> dropout -> 1x1x1 logits
conv -> squeeze to (B, classes). extract_features (i3d.py:336-340): avg_pool k(2,7,7) s1
-> 1024-d; for 16x224x224 inputs the pooled map is (B, 1, 1, 1, 1024).

Layout: ``(B, T, H, W, C)``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ted_spad_tpu.models.layers import max_pool_same, tf_same_pads

Array = jax.Array


class Unit3D(nn.Module):
    """conv3d (TF-SAME dynamic pad) + BN(eps 1e-3, momentum 0.01) + ReLU (i3d.py:48-121)."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pads = [tf_same_pads(x.shape[1 + d], self.kernel[d], self.stride[d]) for d in range(3)]
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            padding=pads,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv3d",
        )(x)
        if self.use_bn:
            # torch BN(eps=0.001, momentum=0.01) -> flax momentum 0.99 (i3d.py:81).
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, name="bn"
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    """4-branch inception block (i3d.py:124-149); concat on channels."""

    out_channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        oc = self.out_channels
        b0 = Unit3D(oc[0], dtype=self.dtype, name="b0")(x, train)
        b1 = Unit3D(oc[1], dtype=self.dtype, name="b1a")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1, train)
        b2 = Unit3D(oc[3], dtype=self.dtype, name="b2a")(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2, train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], dtype=self.dtype, name="b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# Inception endpoint channel specs in order (i3d.py:168-187, 220-306).
_MIXED_SPECS = (
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)


class InceptionI3d(nn.Module):
    """i3d.py:152-340. ``__call__`` -> (logits, 1024-d feature) to match the framework's
    uniform ft interface (the torch original returns logits only; the feature equals
    ``extract_features`` squeezed)."""

    num_classes: int = 400
    dropout_rate: float = 0.5  # reference passes dropout_keep_prob=0.5 as nn.Dropout(p),
    # i.e. it *drops* 50% (model_loaders.py:176, i3d.py:301) — keep the live behavior.
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.conv_1a = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=dt)
        self.conv_2b = Unit3D(64, dtype=dt)
        self.conv_2c = Unit3D(192, (3, 3, 3), dtype=dt)
        self.mixed = {name: InceptionModule(spec, dt) for name, spec in _MIXED_SPECS}
        self.logits_conv = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True, dtype=dt)
        self.dropout = nn.Dropout(self.dropout_rate)

    def trunk(self, x: Array, train: bool = False) -> Array:
        x = self.conv_1a(x, train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a_3x3
        x = self.conv_2b(x, train)
        x = self.conv_2c(x, train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a_3x3
        x = self.mixed["Mixed_3b"](x, train)
        x = self.mixed["Mixed_3c"](x, train)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a_3x3
        for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = self.mixed[ep](x, train)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a_2x2
        x = self.mixed["Mixed_5b"](x, train)
        x = self.mixed["Mixed_5c"](x, train)
        return x

    def __call__(self, x: Array, train: bool = False) -> tuple[Array, Array]:
        x = self.trunk(x, train)
        feat = self.extract_pooled(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)  # adaptive (1,1,1)
        h = self.dropout(pooled.astype(self.dtype), deterministic=not train)
        logits = self.logits_conv(h)
        return logits.reshape(x.shape[0], self.num_classes).astype(jnp.float32), feat

    @staticmethod
    def extract_pooled(trunk_out: Array) -> Array:
        """avg_pool k(2,7,7) s1 then squeeze (i3d.py:336-340; dali_extraction.py:175-179)."""
        f = nn.avg_pool(trunk_out.astype(jnp.float32), (2, 7, 7), (1, 1, 1), padding="VALID")
        return f.reshape(f.shape[0], -1, f.shape[-1]).mean(axis=1)  # (B, 1024)

    def extract_features(self, x: Array, train: bool = False) -> Array:
        return self.extract_pooled(self.trunk(x, train))
