"""I3Res50 ("largei3d") — ResNet-50 inflated to 3D; the default utility model ft.

Reference: aux_code/models/large_i3d.py (I3Res50:130, Bottleneck:42, NonLocalBlock:86) and
the wrapper + 128-d mlp head in aux_code/model_loaders.py (wrapper_i3d:258, mlp:235).

Key semantics preserved:
  - stem conv (5,7,7) stride (2,2,2) pad (2,3,3); maxpool1 k(2,3,3) s(2,2,2) VALID;
    maxpool2 k(2,1,1) s(2,1,1) after layer1 (large_i3d.py:137-145, 175-186).
  - per-block temporal kernel patterns temp_conv: layer1 [1,1,1], layer2 [1,0,1,0],
    layer3 [1,0,1,0,1,0], layer4 [0,1,0] (large_i3d.py:142-145).
  - forward returns ``(logits, 2048-d feat)`` where feat is the pre-dropout avgpool
    (large_i3d.py:228-246); ``extract_features`` returns the avgpool (249-263).
  - FrozenBN fine-tune mode (large_i3d.py:8-39, train_action.py:39-41) via ``frozen_bn``.
  - mlp head: 2048->512 BN ReLU ->128 (no bias) BN, L2-normalized (model_loaders.py:235-254);
    its AMP autocast maps to bf16 compute + f32 normalize here.

Layout: video ``(B, T, H, W, C)`` channels-last (reference is NCTHW).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from ted_spad_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvBN, global_avg_pool, max_pool_valid
from ted_spad_tpu.ops.losses import l2_normalize

Array = jax.Array

# (planes, blocks, spatial_stride, temp_conv pattern). temp_stride is all-1s in the
# reference config (large_i3d.py:142-145) so it is omitted.
_LAYER_SPECS = (
    (64, 3, 1, (1, 1, 1)),
    (128, 4, 2, (1, 0, 1, 0)),
    (256, 6, 2, (1, 0, 1, 0, 1, 0)),
    (512, 3, 2, (0, 1, 0)),
)

# Remat boundary names (jax.ad_checkpoint checkpoint_name identities — numerically
# inert, dropped at lowering) emitted by ``features_from_stem``: the stem output and
# the layer2-4 residual-block outputs. layer1's 56² outputs are deliberately NOT in
# the save set — at training batch sizes they are the bulk of the activation memory,
# so under ``remat='blocks'`` (stages/anonymization_training.py) they rematerialize
# while the cheap deep boundaries stay resident.
FT_REMAT_SAVE_NAMES = ("ft_stem",) + tuple(
    f"ft_blk_l{li + 1}_{bi}"
    for li in (1, 2, 3)
    for bi in range(_LAYER_SPECS[li][1])
)


class Bottleneck3D(nn.Module):
    """large_i3d.py:42-84: (1+2tc,1,1) temporal conv -> (1,3,3) spatial stride -> 1x1x1 x4."""

    planes: int
    stride: int = 1
    temp_conv: int = 0
    downsample: bool = False
    use_nl: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        tc = self.temp_conv
        residual = x
        out = ConvBN(
            self.planes,
            (1 + 2 * tc, 1, 1),
            padding=[(tc, tc), (0, 0), (0, 0)],
            dtype=self.dtype,
            name="conv1",
        )(x, train, frozen_bn)
        out = ConvBN(
            self.planes,
            (1, 3, 3),
            (1, self.stride, self.stride),
            padding=[(0, 0), (1, 1), (1, 1)],
            dtype=self.dtype,
            name="conv2",
        )(out, train, frozen_bn)
        out = ConvBN(self.planes * 4, (1, 1, 1), act=False, dtype=self.dtype, name="conv3")(
            out, train, frozen_bn
        )
        if self.downsample:
            residual = ConvBN(
                self.planes * 4,
                (1, 1, 1),
                (1, self.stride, self.stride),
                act=False,
                dtype=self.dtype,
                name="downsample",
            )(x, train, frozen_bn)
        out = nn.relu(out + residual)
        if self.use_nl:
            out = NonLocalBlock3D(self.planes * 4, dtype=self.dtype, name="nl")(out, train, frozen_bn)
        return out


class NonLocalBlock3D(nn.Module):
    """Non-local attention block (large_i3d.py:86-127). ``use_nl=False`` in the shipped
    config (model_loaders.py:262) but kept for parity."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        dim_inner = self.dim_out // 2
        residual = x
        b = x.shape[0]
        mp = max_pool_valid(x, (1, 2, 2), (1, 2, 2))
        theta = nn.Conv(dim_inner, (1, 1, 1), use_bias=True, dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(dim_inner, (1, 1, 1), use_bias=True, dtype=self.dtype, name="phi")(mp)
        g = nn.Conv(dim_inner, (1, 1, 1), use_bias=True, dtype=self.dtype, name="g")(mp)

        t_shape = theta.shape
        theta2 = theta.reshape(b, -1, dim_inner)  # (B, THW, Ci)
        phi2 = phi.reshape(b, -1, dim_inner)  # (B, thw, Ci)
        g2 = g.reshape(b, -1, dim_inner)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta2, phi2) * (dim_inner**-0.5), axis=-1
        )
        t = jnp.einsum("bnm,bmc->bnc", attn, g2).reshape(t_shape)
        out = ConvBN(self.dim_out, (1, 1, 1), use_bias=True, act=False, dtype=self.dtype, name="out")(
            t, train, frozen_bn
        )
        return out + residual


class I3Res50(nn.Module):
    """The backbone (large_i3d.py:130-263). Returns ``(logits, feat2048)``."""

    num_classes: int = 400
    use_nl: bool = False
    dropout_rate: float = 0.5
    # Non-default specs exist for mesh-semantics dryruns/tests (XLA compile cost on
    # small hosts); _LAYER_SPECS is the reference architecture (large_i3d.py:142-145)
    # and the only configuration with pretrained-weight parity.
    layer_specs: tuple = _LAYER_SPECS
    stem_width: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.stem = ConvBN(
            self.stem_width, (5, 7, 7), (2, 2, 2), padding=[(2, 2), (3, 3), (3, 3)], dtype=self.dtype
        )
        blocks = {}
        inplanes = self.stem_width
        for li, (planes, n_blocks, stride, temp_conv) in enumerate(self.layer_specs):
            nonlocal_mod = 2 if (self.use_nl and li in (1, 2)) else 1000
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or inplanes != planes * 4)
                blocks[f"layer{li + 1}_{bi}"] = Bottleneck3D(
                    planes,
                    s,
                    temp_conv[bi],
                    down,
                    use_nl=(bi % nonlocal_mod == nonlocal_mod - 1),
                    dtype=self.dtype,
                )
                inplanes = planes * 4
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def features(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        """Backbone to 2048-d pooled feature (== extract_features, large_i3d.py:249-263)."""
        x = self.stem(x, train, frozen_bn)
        return self.features_from_stem(x, train, frozen_bn)

    def features_from_stem(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        """Backbone from the stem's output onward — entry point for the space-to-depth
        fast stem (ops/fast_i3d.py), which computes the lane-starved (5,7,7) Cin=3 stem
        conv externally with exactly re-binned taps."""
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "ft_stem")
        x = max_pool_valid(x, (2, 3, 3), (2, 2, 2))
        for bi in range(self.layer_specs[0][1]):
            x = self.blocks[f"layer1_{bi}"](x, train, frozen_bn)
        x = max_pool_valid(x, (2, 1, 1), (2, 1, 1))
        for li in (1, 2, 3):
            for bi in range(self.layer_specs[li][1]):
                x = self.blocks[f"layer{li + 1}_{bi}"](x, train, frozen_bn)
                x = checkpoint_name(x, f"ft_blk_l{li + 1}_{bi}")
        return global_avg_pool(x)  # (B, 2048) f32

    def __call__(self, x: Array, train: bool = False, frozen_bn: bool = False) -> tuple[Array, Array]:
        feat = self.features(x, train, frozen_bn)
        h = self.drop(feat.astype(self.dtype), deterministic=not train)
        logits = self.fc(h).astype(jnp.float32)
        return logits, feat


class MlpHead(nn.Module):
    """128-d temporal-distinctiveness embedding head (model_loaders.py:235-254).

    fc1 2048->512 (bias) -> BN -> ReLU -> fc2 512->128 (no bias) -> BN -> L2 norm.
    BatchNorm1d over the feature axis of (B, D).
    """

    embedding_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x.astype(self.dtype))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.embedding_dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn2"
        )(x)
        return l2_normalize(x.astype(jnp.float32), axis=-1)


class WrapperI3D(nn.Module):
    """wrapper_i3d (model_loaders.py:258-268): I3Res50 + mlp; returns (logits, 128-d emb).

    ``return_backbone_feat=True`` additionally exposes the raw 2048-d feature used by
    feature extraction (st_feature_extraction.py:27-30 falls back to ``ft.i3d.extract_features``
    because the torch wrapper lacks the method — here it is first-class).
    """

    num_classes: int = 102
    use_nl: bool = False
    dropout_rate: float = 0.5
    layer_specs: tuple = _LAYER_SPECS
    stem_width: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.i3d = I3Res50(
            num_classes=self.num_classes,
            use_nl=self.use_nl,
            dropout_rate=self.dropout_rate,
            layer_specs=self.layer_specs,
            stem_width=self.stem_width,
            dtype=self.dtype,
        )
        self.mlp = MlpHead(dtype=self.dtype)

    def __call__(self, x: Array, train: bool = False, frozen_bn: bool = False):
        logits, feat = self.i3d(x, train, frozen_bn)
        emb = self.mlp(feat, train)
        return logits, emb

    def extract_features(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        return self.i3d.features(x, train, frozen_bn)

    def extract_features_from_stem(self, x: Array, train: bool = False, frozen_bn: bool = False) -> Array:
        return self.i3d.features_from_stem(x, train, frozen_bn)

    def forward_from_stem(self, x: Array, train: bool = False, frozen_bn: bool = False):
        """__call__ semantics (logits, 128-d emb) from the stem output onward — the
        logits-path entry for the s2d fast stem (ops/fast_i3d.py)."""
        feat = self.i3d.features_from_stem(x, train, frozen_bn)
        h = self.i3d.drop(feat.astype(self.dtype), deterministic=not train)
        logits = self.i3d.fc(h).astype(jnp.float32)
        emb = self.mlp(feat, train)
        return logits, emb
