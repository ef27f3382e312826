"""MGFN — Magnitude-Contrastive Glance-and-Focus Network for weakly-supervised VAD.

Reference: anomaly_detection_mgfn/models/mgfn.py (mgfn:130, Backbone:88, MSNSD:18) and
blocks in anomaly_detection_mgfn/utils/utils.py (GLANCE:150, FOCUS:124, FeedForward:114,
channel-LayerNorm:101).

TPU-first redesign: the reference works channels-first ``(B, C, T)`` with Conv1d; here
everything is ``(B, T, C)`` channels-last so the 1x1 convs become Dense matmuls on the MXU
and XLA fuses the residual adds. Top-k snippet selection (MSNSD) uses ``jax.lax.top_k``
(static k=3, mgfn.py:184) and batched ``take_along_axis`` instead of the reference's python
loop over crops (mgfn.py:61-66).

Input: ``(B, ncrops, T, F+1)`` — F=2048 features + 1 feature-magnitude channel
(datasets/dataset.py:86-132). Train batches are ``[normal; abnormal]`` halves
(train.py:82-85); inference runs one video with ``inference=True`` (mgfn.py:54-57).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ChannelLayerNorm(nn.Module):
    """utils.py:101-112: (x - mean) / (sqrt(biased var) + eps) * g + b over the channel axis.

    Note the reference adds eps to the *std*, unlike torch LayerNorm (eps on var) — kept.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        b = self.param("b", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        std = jnp.sqrt(jnp.var(xf, axis=-1, keepdims=True))
        return ((xf - mean) / (std + self.eps) * g + b).astype(x.dtype)


def _conv1d(features: int, kernel: int, use_bias: bool = True, name: str | None = None) -> nn.Conv:
    pad = kernel // 2
    return nn.Conv(features, (kernel,), padding=[(pad, pad)], use_bias=use_bias, name=name)


class FeedForward(nn.Module):
    """utils.py:114-121: LN -> 1x1 conv (dim*repe) -> GELU -> dropout -> 1x1 conv."""

    dim: int
    repe: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = ChannelLayerNorm(name="norm")(x)
        h = _conv1d(self.dim * self.repe, 1, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return _conv1d(self.dim, 1, name="fc2")(h)


class Glance(nn.Module):
    """Global MHSA over the (<=32 train / T test) temporal tokens (utils.py:150-180).

    ``mask`` (B, T) marks valid tokens. Padded *keys* are excluded from the softmax, so with
    pad positions re-zeroed between layers (see MGFN.__call__) a bucket-padded forward is
    bit-equal to the reference's native-length run — the TPU-native replacement for
    per-length recompilation on variable-length test videos (test.py:19-31).
    """

    dim: int
    heads: int
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False, mask: Array | None = None) -> Array:
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        h = ChannelLayerNorm(name="norm")(x)
        qkv = _conv1d(inner * 3, 1, use_bias=False, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_view(z: Array) -> Array:
            return z.reshape(b, t, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_view(q) * self.dim_head**-0.5, heads_view(k), heads_view(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32)
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :], sim, -jnp.inf)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return _conv1d(self.dim, 1, name="to_out")(out)


class Focus(nn.Module):
    """Local per-head depthwise temporal aggregation (utils.py:124-147).

    Reference: BN over channels -> 1x1 to_v -> grouped conv1d (groups=heads, kernel 5)
    mixing the ``heads`` channels that share a dim_head slot -> 1x1 to_out. The grouped
    conv is expressed as a feature-group conv on a (B, T, dim_head, heads) view.
    """

    dim: int
    heads: int
    dim_head: int = 64
    kernel: int = 5

    @nn.compact
    def __call__(self, x: Array, train: bool = False, mask: Array | None = None) -> Array:
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm")(x)
        if mask is not None:
            # Eval BN maps zero pads to a nonzero constant (beta - gamma*mean/sigma);
            # re-zero them BEFORE the kernel-5 rel_pos conv so pad taps contribute
            # exactly the zero-padding a native-length forward would see (required for
            # the bit-exact bucketed inference guarantee — see Glance docstring).
            h = h * mask[..., None].astype(h.dtype)
        v = _conv1d(inner, 1, use_bias=False, name="to_v")(h)
        # (B, T, inner) -> channel i = (slot c = i // heads, head g = i % heads): the
        # reference rearrange 'b (c h) t -> (b c) h t' makes head the fastest-varying axis.
        v = v.reshape(b, t, self.dim_head, self.heads)  # (B, T, C_slot, H)
        v = v.transpose(0, 2, 1, 3).reshape(b * self.dim_head, t, self.heads)  # (B*C, T, H)
        # rel_pos: Conv1d(heads->heads, k, groups=heads) == feature_group_count=heads.
        out = nn.Conv(
            self.heads,
            (self.kernel,),
            padding=[(self.kernel // 2, self.kernel // 2)],
            feature_group_count=self.heads,
            use_bias=True,
            name="rel_pos",
        )(v)
        out = out.reshape(b, self.dim_head, t, self.heads).transpose(0, 2, 1, 3).reshape(b, t, inner)
        return _conv1d(self.dim, 1, name="to_out")(out)


class Backbone(nn.Module):
    """Stage of depth x [conv3 residual -> attention residual -> FF residual] (mgfn.py:88-126)."""

    dim: int
    depth: int
    heads: int
    mgfn_type: str  # 'gb' | 'fb'
    kernel: int = 5
    dim_head: int = 64
    ff_repe: int = 4
    dropout: float = 0.0
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False, mask: Array | None = None) -> Array:
        def rezero(z: Array) -> Array:
            # Keep pad positions exactly zero so conv bleed equals native-length zero-pad.
            return z if mask is None else z * mask[..., None].astype(z.dtype)

        for i in range(self.depth):
            x = rezero(_conv1d(self.dim, 3, name=f"scc{i}")(x) + x)
            if self.mgfn_type == "gb":
                attn_out = Glance(
                    self.dim, self.heads, self.dim_head, self.attention_dropout, name=f"attn{i}"
                )(x, train, mask)
            elif self.mgfn_type == "fb":
                attn_out = Focus(self.dim, self.heads, self.dim_head, self.kernel, name=f"attn{i}")(
                    x, train, mask
                )
            else:
                raise ValueError(f"unknown mgfn_type {self.mgfn_type}")
            x = rezero(attn_out + x)
            x = rezero(FeedForward(self.dim, self.ff_repe, self.dropout, name=f"ff{i}")(x, train) + x)
        return x


def msnsd(
    features: Array,
    scores: Array,
    ncrops: int,
    k: int,
    dropout_fn,
    inference: bool,
) -> tuple[Array, Array, Array, Array, Array]:
    """Magnitude Selection aNd Score prediction (mgfn.py:18-86).

    ``features``: (bs*ncrops, T, F) last-stage tokens; ``scores``: (bs*ncrops, T, 1).
    Train: bs = 2*batch — first half normal, second abnormal. Inference: bs == batch
    (normal branch reused for both, mgfn.py:54-57 — a *static* python branch here).

    Returns (score_abnormal (batch,1), score_normal (batch,1),
    abn_feamagnitude (ncrops*batch, k, F), nor_feamagnitude, scores (bs, T, 1)).
    """
    bc, t, f = features.shape
    bs = bc // ncrops
    batch = bs if inference else bs // 2

    scores = scores.reshape(bs, ncrops, t).mean(axis=1)[..., None]  # (bs, T, 1)
    feat_mag = jnp.linalg.norm(features.astype(jnp.float32), axis=2)  # (bs*ncrops, T)
    feat_mag = feat_mag.reshape(bs, ncrops, t).mean(axis=1)  # (bs, T)

    nor_feats = features[: batch * ncrops].reshape(batch, ncrops, t, f)
    nor_scores = scores[:batch]
    nor_mag = feat_mag[:batch]
    if inference:
        abn_feats, abn_scores, abn_mag = nor_feats, nor_scores, nor_mag
    else:
        abn_feats = features[batch * ncrops :].reshape(batch, ncrops, t, f)
        abn_scores = scores[batch:]
        abn_mag = feat_mag[batch:]

    def select(mag: Array, feats: Array, scr: Array) -> tuple[Array, Array]:
        drop_mag = mag * dropout_fn(jnp.ones_like(mag))
        idx = jax.lax.top_k(drop_mag, k)[1]  # (batch, k)
        # Crop-major concat ordering as the reference's per-crop loop (mgfn.py:61-66).
        sel = jnp.take_along_axis(feats, idx[:, None, :, None], axis=2)  # (batch, ncrops, k, F)
        sel = sel.transpose(1, 0, 2, 3).reshape(ncrops * idx.shape[0], k, f)
        sel_scores = jnp.take_along_axis(scr, idx[..., None], axis=1).mean(axis=1)  # (batch, 1)
        return sel, sel_scores

    abn_feamagnitude, score_abnormal = select(abn_mag, abn_feats, abn_scores)
    nor_feamagnitude, score_normal = select(nor_mag, nor_feats, nor_scores)
    return score_abnormal, score_normal, abn_feamagnitude, nor_feamagnitude, scores


class MGFN(nn.Module):
    """mgfn.py:130-202. ``__call__(video (B, ncrops, T, F+1))`` ->
    (score_abnormal, score_normal, abn_feamagnitude, nor_feamagnitude, scores)."""

    feature_size: int = 2048
    dims: Sequence[int] = (64, 128, 1024)
    depths: Sequence[int] = (3, 3, 2)
    mgfn_types: Sequence[str] = ("gb", "fb", "fb")
    local_kernel: int = 5
    ff_repe: int = 4
    dim_head: int = 64
    mag_ratio: float = 0.1
    dropout_rate: float = 0.7
    attention_dropout: float = 0.0
    k: int = 3

    @nn.compact
    def __call__(
        self,
        video: Array,
        train: bool = False,
        inference: bool = False,
        mask: Array | None = None,
    ):
        """``mask`` (B, T) of valid snippets enables static-bucket padded inference:
        pad ``video`` on T, pass the validity mask, and slice the returned scores — the
        result is bit-equal to a native-length forward (see Glance docstring). Inference
        only (FOCUS batch-stats ignore the mask in train mode; training is always the
        fixed 32 segments, datasets/dataset.py:86-132)."""
        bs, ncrops, t, c = video.shape
        assert c == self.feature_size + 1, f"expected F+1 channels, got {c}"
        x = video.reshape(bs * ncrops, t, c)
        cmask = None
        if mask is not None:
            cmask = jnp.repeat(mask, ncrops, axis=0)  # (bs*ncrops, T)
            x = x * cmask[..., None].astype(x.dtype)
        x_f = _conv1d(self.dims[0], 3, name="to_tokens")(x[..., : self.feature_size])
        x_m = _conv1d(self.dims[0], 3, name="to_mag")(x[..., self.feature_size :])
        x_f = x_f + self.mag_ratio * x_m
        if cmask is not None:
            x_f = x_f * cmask[..., None].astype(x_f.dtype)

        for i, (dim, depth, mtype) in enumerate(zip(self.dims, self.depths, self.mgfn_types)):
            x_f = Backbone(
                dim=dim,
                depth=depth,
                heads=dim // self.dim_head,
                mgfn_type=mtype,
                kernel=self.local_kernel,
                dim_head=self.dim_head,
                ff_repe=self.ff_repe,
                dropout=self.attention_dropout,
                attention_dropout=self.attention_dropout,
                name=f"stage{i}",
            )(x_f, train, cmask)
            if i < len(self.dims) - 1:
                x_f = ChannelLayerNorm(name=f"transition_norm{i}")(x_f)
                x_f = _conv1d(self.dims[i + 1], 1, name=f"transition_conv{i}")(x_f)
                if cmask is not None:
                    x_f = x_f * cmask[..., None].astype(x_f.dtype)

        # to_logits: standard torch LayerNorm over channels (mgfn.py:176-178).
        tokens = nn.LayerNorm(name="to_logits_norm")(x_f)
        scores = nn.sigmoid(nn.Dense(1, name="fc")(tokens).astype(jnp.float32))  # (bs*ncrops, T, 1)

        drop = nn.Dropout(self.dropout_rate)
        dropout_fn = lambda ones: drop(ones, deterministic=not train)
        return msnsd(tokens.astype(jnp.float32), scores, ncrops, self.k, dropout_fn, inference)
