"""TPU-fast inference stem for I3Res50 (models/i3res50.py; reference large_i3d.py:135).

The stem is a (5,7,7)/stride-(2,2,2) conv with Cin=3 — three input lanes of 128 on the
MXU. Profiled on v5e it is the single most expensive op of the whole extraction
program (11.8 ms of 62 ms per 256-frame batch, 12.8 TF/s).

Fix: re-bin the spatial taps onto a 2x2 space-to-depth grid. With the input viewed as
(T, H/2, W/2, 12), the 7-tap stride-2 spatial window becomes a 4-tap stride-1 window
over coarse pixels, and each fine tap (offset k) lands at coarse offset floor(k/2),
parity k mod 2 — an EXACT weight permutation (zero extra FLOPs, 4x the input lanes).

Pure function over the unchanged WrapperI3D/I3Res50 param tree; the rest of the
backbone runs through the module via ``method="extract_features_from_stem"``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def space_to_depth_2x2(x: Array) -> Array:
    """(..., H, W, C) -> (..., H/2, W/2, 4C) with (py, px, c)-major channel order."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    nd = x.ndim
    # (..., h2, 2, w2, 2, c) -> (..., h2, w2, 2, 2, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space_2x2(x: Array) -> Array:
    """Inverse of ``space_to_depth_2x2``: (..., H, W, 4C) -> (..., 2H, 2W, C)."""
    *lead, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*lead, h, w, 2, 2, c)
    nd = x.ndim
    # (..., h, w, 2, 2, c) -> (..., h, 2, w, 2, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, 2 * h, 2 * w, c)


def stem_s2d_kernel(w: Array) -> Array:
    """(5,7,7,3,Cout) -> (5,4,4,12,Cout): exact tap re-binning for the s2d input.

    Fine offset k = j - 3 (j the kernel index) maps to coarse tap a = floor(k/2)+2
    and parity q = k mod 2; input channel block (qy, qx, c) matches
    ``space_to_depth_2x2``'s channel order.
    """
    kt, kh, kw, cin, cout = w.shape
    assert (kh, kw, cin) == (7, 7, 3), w.shape
    ws = jnp.zeros((kt, 4, 4, 4, cin, cout), w.dtype)
    for jy in range(7):
        ay, qy = (jy - 3) // 2 + 2, (jy - 3) % 2
        for jx in range(7):
            ax, qx = (jx - 3) // 2 + 2, (jx - 3) % 2
            ws = ws.at[:, ay, ax, qy * 2 + qx, :, :].set(w[:, jy, jx])
    return ws.reshape(kt, 4, 4, 4 * cin, cout)


def _make_fast(ft_model, fast_method: str, fallback_method: str | None):
    """Shared factory: s2d fast stem, then the module from ``fast_method`` onward;
    module apply via ``fallback_method`` (None = __call__) for train / odd sizes /
    non-largei3d models."""
    from ted_spad_tpu.models.i3res50 import WrapperI3D

    def module_apply(variables, x, train=False):
        kw = {"method": fallback_method} if fallback_method else {}
        return ft_model.apply(variables, x, train=train, **kw)

    if not isinstance(ft_model, WrapperI3D):
        return module_apply

    dtype = ft_model.dtype
    eps = 1e-5

    def fast(variables, x, train=False, input_s2d=False):
        if train or "batch_stats" not in variables or (
            not input_s2d and (x.shape[-2] % 2 or x.shape[-3] % 2)
        ):
            if input_s2d:
                # Graceful degrade: undo the layout (exact inverse) so the plain
                # module still sees Cin=3 fine-resolution frames.
                x = depth_to_space_2x2(x)
            return module_apply(variables, x, train=train)
        p = variables["params"]["i3d"]["stem"]
        s = variables["batch_stats"]["i3d"]["stem"]
        ws = stem_s2d_kernel(p["conv"]["kernel"])
        xs = x.astype(dtype) if input_s2d else space_to_depth_2x2(x.astype(dtype))
        # Fine pad (3,3) -> coarse pad (2,1) per spatial dim; temporal pad (2,2)
        # unchanged (stem padding [(2,2),(3,3),(3,3)], i3res50.py:130-132).
        y = jax.lax.conv_general_dilated(
            xs, ws.astype(dtype), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dtype,
        )
        scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + eps)
        bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
        y = jax.nn.relu(y * scale.astype(dtype) + bias.astype(dtype))
        return ft_model.apply(variables, y, train=False, method=fast_method)

    fast.supports_s2d = True
    return fast


def make_fast_ft_extract(ft_model):
    """``extract(variables, clips, train=False)`` == the module's ``extract_features``
    (stages/feature_extraction.py hot path; reference dali_extraction.py:175-179)
    with the stem computed s2d-fast."""
    return _make_fast(ft_model, "extract_features_from_stem", "extract_features")


def make_fast_ft_forward(ft_model):
    """``forward(variables, clips, train=False) -> (logits, emb)`` == the module's
    __call__ (action/anonymizer eval sweeps, train_action.py:330-381) with the stem
    computed s2d-fast."""
    return _make_fast(ft_model, "forward_from_stem", None)


def make_fast_ft_train_forward(ft_model):
    """TRAIN-mode forward with the s2d fast stem:
    ``fwd(variables, x, rng=None, frozen_bn=False) -> ((logits, emb), mutated)``,
    drop-in for ``module.apply(..., train=True, mutable=["batch_stats"], rngs=...)``
    (action/anonymizer ft-training hot paths, train_action.py:28-105,
    train_anonymizer.py:151-193).

    The stem conv runs on the space-to-depth layout with exactly re-binned taps
    (``stem_s2d_kernel``; 12 input lanes instead of 3). The re-binning is a linear
    map computed inside the traced function, so gradients chain back to the
    original (5,7,7,3,64) kernel exactly. Stem BN reproduces flax's train-mode
    batch statistics (f32 fast-variance, momentum/eps from models/layers.py);
    the returned batch_stats tree has the stem's running stats overridden with
    that update (flax returns the full collection, unexecuted modules included —
    the stem subtree it reports would otherwise be stale). ``frozen_bn=True``
    folds the running stats into a post-conv affine and leaves them unchanged,
    matching FrozenBN (large_i3d.py:8-39)."""
    from ted_spad_tpu.models.i3res50 import WrapperI3D
    from ted_spad_tpu.models.layers import BN_EPS, BN_MOMENTUM

    def module_apply(variables, x, rng=None, frozen_bn=False):
        kw = {"frozen_bn": True} if frozen_bn else {}
        if rng is not None:
            kw["rngs"] = {"dropout": rng}
        return ft_model.apply(variables, x, train=True, mutable=["batch_stats"], **kw)

    if not isinstance(ft_model, WrapperI3D):
        return module_apply

    dtype = ft_model.dtype

    def fast(variables, x, rng=None, frozen_bn=False):
        if "batch_stats" not in variables or x.shape[-2] % 2 or x.shape[-3] % 2:
            return module_apply(variables, x, rng=rng, frozen_bn=frozen_bn)
        p = variables["params"]["i3d"]["stem"]
        s = variables["batch_stats"]["i3d"]["stem"]
        ws = stem_s2d_kernel(p["conv"]["kernel"])
        xs = space_to_depth_2x2(x.astype(dtype))
        y = jax.lax.conv_general_dilated(
            xs, ws.astype(dtype), (2, 1, 1), [(2, 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dtype,
        )
        if frozen_bn:
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            y = jax.nn.relu(y * scale.astype(dtype) + bias.astype(dtype))
            new_stem = None  # FrozenBN: stats used, never updated
        else:
            # flax _compute_stats promotes to promote_types(f32, input dtype):
            # f32 stats for f32/bf16 compute, f64 under x64 parity tests.
            f = y.astype(jnp.promote_types(jnp.float32, y.dtype))
            mean = f.mean((0, 1, 2, 3))
            var = jnp.maximum(0.0, (f * f).mean((0, 1, 2, 3)) - mean * mean)
            out = (f - mean) * jax.lax.rsqrt(var + BN_EPS) * p["bn"]["scale"] + p["bn"]["bias"]
            y = jax.nn.relu(out.astype(dtype))
            m = BN_MOMENTUM
            new_stem = {"bn": {
                "mean": m * s["bn"]["mean"] + (1 - m) * mean,
                "var": m * s["bn"]["var"] + (1 - m) * var,
            }}
        kw = {"frozen_bn": True} if frozen_bn else {}
        if rng is not None:
            kw["rngs"] = {"dropout": rng}
        out, mutated = ft_model.apply(
            variables, y, train=True, mutable=["batch_stats"],
            method="forward_from_stem", **kw,
        )
        if new_stem is not None:
            bs = dict(mutated["batch_stats"])
            i3d = dict(bs["i3d"])
            i3d["stem"] = new_stem
            bs["i3d"] = i3d
            mutated = {"batch_stats": bs}
        return out, mutated

    return fast
