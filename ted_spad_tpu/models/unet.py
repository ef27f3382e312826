"""Anonymizer fa architectures: UNet and UNet++ (ResNet-18 encoder).

Reference:
  - UNet: aux_code/models/unet_model.py:6-37 + unet_parts.py (4-down/4-up, bilinear
    upsample align_corners=True, sigmoid output).
  - UNet++: segmentation_models_pytorch ``UnetPlusPlus(encoder_name='resnet18',
    encoder_depth=4, decoder_channels=(256,128,64,32), in_channels=3, classes=3,
    activation=None)`` (aux_code/model_loaders.py:18-30) — reimplemented here since smp is
    torch-only. Raw (un-activated) RGB output, matching ``activation=None``.

Layout NHWC; per-frame 2D model — video batches are reshaped to (B*T, H, W, C) by callers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ted_spad_tpu.models.layers import ConvBN, pad_to_match, resize_bilinear, resize_nearest
from ted_spad_tpu.models.resnet2d import ResNet2D

Array = jax.Array


class DoubleConv(nn.Module):
    """(conv3x3 => BN => ReLU) * 2 (unet_parts.py:8-25)."""

    features: int
    mid_features: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        mid = self.mid_features or self.features
        x = ConvBN(mid, (3, 3), use_bias=True, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.features, (3, 3), use_bias=True, dtype=self.dtype, name="conv2")(x, train)
        return x


class UNet(nn.Module):
    """Classic UNet fa (unet_model.py:6-37): bilinear variant, sigmoid RGB output."""

    n_classes: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train)
        x2 = DoubleConv(128, dtype=self.dtype, name="down1")(nn.max_pool(x1, (2, 2), (2, 2)), train)
        x3 = DoubleConv(256, dtype=self.dtype, name="down2")(nn.max_pool(x2, (2, 2), (2, 2)), train)
        x4 = DoubleConv(512, dtype=self.dtype, name="down3")(nn.max_pool(x3, (2, 2), (2, 2)), train)
        x5 = DoubleConv(512, dtype=self.dtype, name="down4")(nn.max_pool(x4, (2, 2), (2, 2)), train)

        def up(a: Array, skip: Array, out_ch: int, mid_ch: int, name: str) -> Array:
            a = resize_bilinear(a, 2)
            a = pad_to_match(a, skip.shape[-3], skip.shape[-2])
            cat = jnp.concatenate([skip, a], axis=-1)
            return DoubleConv(out_ch, mid_ch, dtype=self.dtype, name=name)(cat, train)

        y = up(x5, x4, 256, 512, "up1")
        y = up(y, x3, 128, 256, "up2")
        y = up(y, x2, 64, 128, "up3")
        y = up(y, x1, 64, 64, "up4")
        logits = nn.Conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype, name="outc")(y)
        return nn.sigmoid(logits.astype(jnp.float32))


class UnetPPDecoderBlock(nn.Module):
    """smp DecoderBlock: nearest 2x upsample -> concat skip -> (conv3x3 BN ReLU) x2."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array | None, train: bool = False) -> Array:
        x = resize_nearest(x, 2)
        if skip is not None:
            x = pad_to_match(x, skip.shape[-3], skip.shape[-2])
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBN(self.features, (3, 3), dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.features, (3, 3), dtype=self.dtype, name="conv2")(x, train)
        return x


class UNetPlusPlus(nn.Module):
    """UNet++ with ResNet-18 encoder, depth 4 — the default fa (model_loaders.py:18-30).

    Dense nested skip grid x_{depth,layer} per Zhou et al. 2018 and smp's
    UnetPlusPlusDecoder wiring: encoder feats [x/2(64), x/4(64), x/8(128), x/16(256)],
    decoder channels (256, 128, 64, 32), final conv3x3 -> 3 raw channels.
    """

    out_channels: int = 3
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    # Encoder depth/width knobs exist for mesh-semantics dryruns/tests (XLA compile
    # cost on small hosts); the defaults are the reference architecture and the only
    # configuration with pretrained-weight parity.
    encoder_layers: Sequence[int] = (2, 2, 2, 2)
    encoder_width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_h, in_w = x.shape[-3], x.shape[-2]
        # ResNet-18 encoder, depth 4: feats [input, /2 64, /4 64, /8 128, /16 256].
        feats = ResNet2D(
            block="basic", layers=tuple(self.encoder_layers), depth=4,
            width=self.encoder_width, dtype=self.dtype, name="encoder",
        )(x, train)
        # smp drops the input skip and reverses: f[0]=/16(256) f[1]=/8(128) f[2]=/4(64) f[3]=/2(64).
        f = feats[1:][::-1]
        dec = self.decoder_channels
        skip_ch_block = (f[1].shape[-1], f[2].shape[-1], f[3].shape[-1])  # (128, 64, 64)

        def block(name: str, features: int, xin: Array, skip: Array | None) -> Array:
            return UnetPPDecoderBlock(features, dtype=self.dtype, name=name)(xin, skip, train)

        # Column 0 (plain UNet backbone diagonal).
        x_0_0 = block("x_0_0", dec[0], f[0], f[1])  # /8
        x_1_1 = block("x_1_1", skip_ch_block[1], f[1], f[2])  # /4
        x_2_2 = block("x_2_2", skip_ch_block[2], f[2], f[3])  # /2
        # Column 1: dense skips.
        x_0_1 = block("x_0_1", dec[1], x_0_0, jnp.concatenate([x_1_1, f[2]], axis=-1))  # /4
        x_1_2 = block("x_1_2", skip_ch_block[2], x_1_1, jnp.concatenate([x_2_2, f[3]], axis=-1))  # /2
        # Column 2.
        x_0_2 = block("x_0_2", dec[2], x_0_1, jnp.concatenate([x_1_2, x_2_2, f[3]], axis=-1))  # /2
        # Final no-skip upsample to full resolution.
        x_0_3 = block("x_0_3", dec[3], x_0_2, None)  # /1
        x_0_3 = pad_to_match(x_0_3, in_h, in_w)

        # Segmentation head: conv3x3, activation=None (raw output).
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype, name="head")(
            x_0_3
        )
        return out.astype(jnp.float32)


def apply_fa_per_frame(fa_apply, variables, video: Array, train: bool = False, **kw) -> Array:
    """Run a 2D fa over every frame of ``(B, T, H, W, C)`` video.

    NOTE: this is the *clean* per-frame path. The reference contains a layout quirk
    (train_anonymizer.py:87-92) where the reshape mixes channel/time; see
    ``ted_spad_tpu.ops.temporal.scrambled_frame_view`` for the compat path.
    """
    b, t = video.shape[0], video.shape[1]
    frames = video.reshape((b * t,) + video.shape[2:])
    out = fa_apply(variables, frames, train=train, **kw)
    if isinstance(out, tuple):
        out = out[0]
    return out.reshape((b, t) + out.shape[1:])
