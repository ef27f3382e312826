"""MViTv2-S — Multiscale Vision Transformer v2 (small), alternative ft arch 'mvitv2'.

Reference use: ``wrapper_mvit`` (aux_code/model_loaders.py:217-232) wraps torchvision's
``mvit_v2_s`` — head replaced for num_classes, forward returns ``(pred, 768-d feature)``.
torchvision is torch-only, so this is a from-scratch flax implementation of the MViTv2-S
recipe (Li et al., CVPR 2022): 4 stages of [1, 2, 11, 2] blocks, dims 96->192->384->768,
heads 1->2->4->8, pooled multi-head attention with
  - depthwise-conv pooling of q/k/v (k=3, q stride (1,2,2) at stage transitions,
    kv stride shrinking (1,8,8) -> (1,1,1)),
  - decomposed relative position embeddings (T/H/W), and
  - the v2 residual pooling connection (attn += pooled q).
Patch embed: conv3d k(3,7,7) s(2,4,4). Class token carried through; pred head LN+Linear.

TPU notes: token tensors stay (B, N, C); poolings reshape to (B, T, H, W, C) so XLA maps
the depthwise convs onto the VPU; attention is einsum MHSA (MXU); rel-pos adds are
gather + einsum with static shapes per stage.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _rel_pos_1d(q_size: int, k_size: int, table: Array) -> Array:
    """Interpolation-free decomposed rel-pos lookup (MViTv2): (q_size, k_size, head_dim)."""
    # Relative distance grid with the standard max-offset indexing.
    ratio_q = max(k_size / q_size, 1.0)
    ratio_k = max(q_size / k_size, 1.0)
    qi = jnp.arange(q_size)[:, None] * ratio_q
    ki = jnp.arange(k_size)[None, :] * ratio_k
    rel = (qi - ki) + (k_size - 1) * ratio_k
    return jnp.take(table, rel.astype(jnp.int32), axis=0)


class PooledAttention(nn.Module):
    """MViTv2 pooled MHSA with residual pooling + decomposed rel-pos.

    torchvision-parity semantics (models/video/mvit.py MultiscaleAttention):
      - q/k/v pooling is PER-HEAD: depthwise conv over ``head_dim`` channels shared
        across heads, followed by a shared ``LayerNorm(head_dim)`` (the Pool module's
        norm_act) applied to the cls token too;
      - residual pooling adds pooled q to all but the cls row
        (residual_with_cls_embed=False in mvit_v2_s).
    """

    dim_out: int
    heads: int
    q_stride: Sequence[int]
    kv_stride: Sequence[int]
    input_thw: tuple[int, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, thw: tuple[int, int, int]) -> tuple[Array, tuple[int, int, int]]:
        b, n, _ = x.shape
        heads = self.heads
        head_dim = self.dim_out // heads
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        # Channel layout matches torch's reshape(B, N, 3, heads, head_dim).
        qkv = qkv.reshape(b, n, 3, heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, head_dim)

        def pool(z: Array, name: str, stride) -> tuple[Array, tuple[int, int, int]]:
            # Fold heads into batch; depthwise conv + LayerNorm over head_dim, both
            # shared across heads (torchvision Pool). cls passes the conv, gets the norm.
            z = z.transpose(0, 2, 1, 3).reshape(b * heads, n, head_dim)
            cls, grid = z[:, :1], z[:, 1:]
            t, hh, ww = thw
            grid = grid.reshape(b * heads, t, hh, ww, head_dim)
            grid = nn.Conv(
                head_dim, (3, 3, 3), strides=tuple(stride), padding=[(1, 1)] * 3,
                feature_group_count=head_dim, use_bias=False, dtype=self.dtype, name=name,
            )(grid)
            nt, nh, nw = grid.shape[1], grid.shape[2], grid.shape[3]
            z = jnp.concatenate([cls, grid.reshape(b * heads, -1, head_dim)], axis=1)
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_norm")(z)
            return z.reshape(b, heads, -1, head_dim), (nt, nh, nw)

        qh, q_thw = pool(q, "pool_q", self.q_stride)
        kh, k_thw = pool(k, "pool_k", self.kv_stride)
        vh, _ = pool(v, "pool_v", self.kv_stride)
        attn = jnp.einsum("bhid,bhjd->bhij", qh * head_dim**-0.5, kh).astype(jnp.float32)

        # Decomposed rel-pos on the grid part (cls row/col excluded).
        qt, qhh, qww = q_thw
        kt, khh, kww = k_thw
        max_t = 2 * max(qt, kt) - 1
        max_h = 2 * max(qhh, khh) - 1
        max_w = 2 * max(qww, kww) - 1
        rt = self.param("rel_pos_t", nn.initializers.zeros, (max_t, head_dim))
        rh = self.param("rel_pos_h", nn.initializers.zeros, (max_h, head_dim))
        rw = self.param("rel_pos_w", nn.initializers.zeros, (max_w, head_dim))
        q_grid = qh[:, :, 1:].reshape(b, self.heads, qt, qhh, qww, head_dim)
        bias = (
            jnp.einsum("bhtxyd,tkd->bhtxyk", q_grid, _rel_pos_1d(qt, kt, rt))[..., :, None, None]
            + jnp.einsum("bhtxyd,xkd->bhtxyk", q_grid, _rel_pos_1d(qhh, khh, rh))[..., None, :, None]
            + jnp.einsum("bhtxyd,ykd->bhtxyk", q_grid, _rel_pos_1d(qww, kww, rw))[..., None, None, :]
        )  # (b, h, qt, qh, qw, kt, kh, kw)
        bias = bias.reshape(b, self.heads, qt * qhh * qww, kt * khh * kww).astype(jnp.float32)
        attn = attn.at[:, :, 1:, 1:].add(bias)

        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        # v2 residual pooling; cls row excluded (residual_with_cls_embed=False).
        out = out.at[:, :, 1:].add(qh[:, :, 1:])
        out = out.transpose(0, 2, 1, 3).reshape(b, qh.shape[2], self.dim_out)
        out = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)
        return out, q_thw


class MViTBlock(nn.Module):
    dim_out: int
    heads: int
    q_stride: Sequence[int]
    kv_stride: Sequence[int]
    input_thw: tuple[int, int, int]
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, thw: tuple[int, int, int]) -> tuple[Array, tuple[int, int, int]]:
        dim_in = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        attn_out, new_thw = PooledAttention(
            self.dim_out, self.heads, self.q_stride, self.kv_stride, self.input_thw,
            dtype=self.dtype, name="attn",
        )(h, thw)
        shortcut = x
        if dim_in != self.dim_out:
            # v2 (proj_after_attn): the skip projection reuses the norm1 output
            # (torchvision MultiscaleBlock.forward), not a separate norm.
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj_skip")(h)
        if tuple(self.q_stride) != (1, 1, 1):
            # Skip path pools like q: kernel s+1 (pad k//2) per strided dim, 1 otherwise
            # (torchvision mvit kernel_skip rule) — a stride-(1,2,2) transition must NOT
            # mix adjacent-time tokens in the residual.
            b, n, c = shortcut.shape
            t, hh, ww = thw
            cls, grid = shortcut[:, :1], shortcut[:, 1:]
            grid = grid.reshape(b, t, hh, ww, c)
            kernel = tuple(s + 1 if s > 1 else 1 for s in self.q_stride)
            pads = [(0, 0)] + [(k // 2, k // 2) for k in kernel] + [(0, 0)]
            grid = nn.max_pool(
                jnp.pad(grid, pads, constant_values=-jnp.inf),
                kernel, strides=tuple(self.q_stride), padding="VALID",
            )
            grid = grid.reshape(b, -1, c)
            shortcut = jnp.concatenate([cls, grid], axis=1)
        x = shortcut + attn_out
        h2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h2 = nn.Dense(self.dim_out * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        h2 = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(h2)
        return x + h2, new_thw


@dataclasses.dataclass(frozen=True)
class MViTv2Config:
    depths: tuple[int, ...] = (1, 2, 11, 2)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    heads: tuple[int, ...] = (1, 2, 4, 8)
    kv_strides: tuple[tuple[int, int, int], ...] = ((1, 8, 8), (1, 4, 4), (1, 2, 2), (1, 1, 1))


class MViTv2S(nn.Module):
    """Returns ``(logits, 768-d feature)`` like wrapper_mvit (model_loaders.py:228-232)."""

    num_classes: int = 400
    config: MViTv2Config = MViTv2Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> tuple[Array, Array]:
        cfg = self.config
        b = x.shape[0]
        # Patch embed conv3d k(3,7,7) s(2,4,4) p(1,3,3).
        x = nn.Conv(
            cfg.dims[0], (3, 7, 7), strides=(2, 4, 4), padding=[(1, 1), (3, 3), (3, 3)],
            dtype=self.dtype, name="patch_embed",
        )(x)
        t, h, w = x.shape[1], x.shape[2], x.shape[3]
        tokens = x.reshape(b, t * h * w, cfg.dims[0])
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.dims[0]))
        tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(tokens.dtype), tokens], axis=1)
        thw = (t, h, w)

        for si, depth in enumerate(cfg.depths):
            for bi in range(depth):
                # Stage transition: first block of stages 1+ expands dim and strides q.
                is_transition = si > 0 and bi == 0
                dim_out = cfg.dims[si]
                q_stride = (1, 2, 2) if is_transition else (1, 1, 1)
                tokens, thw = MViTBlock(
                    dim_out=dim_out,
                    heads=cfg.heads[si],
                    q_stride=q_stride,
                    kv_stride=cfg.kv_strides[si],
                    input_thw=thw,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(tokens, thw)

        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tokens)
        feature = tokens[:, 0].astype(jnp.float32)  # cls token = 768-d wrapper feature
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(
            feature.astype(self.dtype)
        ).astype(jnp.float32)
        return logits, feature

    def extract_features(self, x: Array, train: bool = False) -> Array:
        _, feat = self(x, train)
        return feat
