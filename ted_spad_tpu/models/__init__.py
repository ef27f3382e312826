"""Model zoo + factory — the TPU equivalent of aux_code/model_loaders.py.

``load_fa_model`` / ``load_ft_model`` / ``load_fb_model`` mirror the reference factories
(model_loaders.py:17, 56, 94) but return ``(module, variables)`` pairs: flax modules are
stateless, so "loading" = init at the right shapes + optionally restoring a checkpoint's
``*_model_state_dict`` entry.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ted_spad_tpu.models.i3d import InceptionI3d
from ted_spad_tpu.models.i3res50 import I3Res50, MlpHead, WrapperI3D
from ted_spad_tpu.models.mgfn import MGFN
from ted_spad_tpu.models.mvit import MViTv2S
from ted_spad_tpu.models.r3d import R3D18
from ted_spad_tpu.models.resnet2d import ResNet2D, ResNet50Classifier, ResNet50SSL
from ted_spad_tpu.models.unet import UNet, UNetPlusPlus
from ted_spad_tpu.utils.checkpoint import load_checkpoint, restore_like

__all__ = [
    "InceptionI3d",
    "I3Res50",
    "MlpHead",
    "WrapperI3D",
    "MGFN",
    "MViTv2S",
    "R3D18",
    "ResNet2D",
    "ResNet50Classifier",
    "ResNet50SSL",
    "UNet",
    "UNetPlusPlus",
    "load_fa_model",
    "load_ft_model",
    "load_fb_model",
    "load_mgfn_model",
]


def _dtype(name: str | None) -> jnp.dtype:
    return jnp.dtype(name) if name else jnp.float32


def _maybe_restore(variables: Any, ckpt_file: str | None, key: str) -> Any:
    if not ckpt_file:
        return variables
    state = load_checkpoint(ckpt_file)
    entry = state.get(key, state)  # accept bare-variables checkpoints too
    return restore_like(variables, entry)


# Reduced-graph model configs for mesh-semantics dryruns and sharding tests: the
# SAME architectures/step code at tiny widths and single-block depths, so XLA
# compile time on small hosts stops gating multi-device validation
# (__graft_entry__.dryrun_multichip). Never used for training or weight parity.
_TINY_FT_SPECS = ((8, 1, 1, (1,)), (16, 1, 2, (1,)), (32, 1, 2, (1,)), (64, 1, 2, (0,)))


def load_fa_model(
    saved_model_file: str | None = None,
    arch: str = "unet++",
    *,
    rng: jax.Array | None = None,
    image_size: tuple[int, int] = (224, 224),
    dtype: str | None = "bfloat16",
    tiny: bool = False,
):
    """Anonymizer factory (model_loaders.py:17-53). Returns (module, variables)."""
    if arch == "unet++":
        if tiny:
            model = UNetPlusPlus(
                decoder_channels=(16, 8, 8, 8), encoder_layers=(1, 1, 1, 1),
                encoder_width=8, dtype=_dtype(dtype),
            )
        else:
            model = UNetPlusPlus(dtype=_dtype(dtype))
    elif arch == "unet":
        model = UNet(dtype=_dtype(dtype))
    else:
        raise ValueError(f"Architecture {arch!r} invalid for fa_model. Try 'unet' or 'unet++'")
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, *image_size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(rng, dummy, train=False)
    return model, _maybe_restore(variables, saved_model_file, "fa_model_state_dict")


def load_ft_model(
    arch: str = "largei3d",
    saved_model_file: str | None = None,
    num_classes: int = 400,
    kin_pretrained: bool = False,
    *,
    rng: jax.Array | None = None,
    clip_shape: tuple[int, int, int] = (16, 224, 224),
    dtype: str | None = "bfloat16",
    dropout_rate: float | None = None,
    tiny: bool = False,
):
    """Utility (action) model factory (model_loaders.py:56-91). Returns (module, variables).

    ``kin_pretrained`` expects a converted-Kinetics checkpoint path via ``saved_model_file``
    (see ted_spad_tpu.utils.torch_convert); torch .pth seeds are dependency artifacts, not
    shipped here.
    """
    if tiny and arch != "largei3d":
        raise ValueError(f"tiny variant only exists for 'largei3d', not {arch!r}")
    if arch == "i3d":
        kw = {"dropout_rate": dropout_rate} if dropout_rate is not None else {}
        model = InceptionI3d(num_classes=num_classes, dtype=_dtype(dtype), **kw)
    elif arch == "largei3d":
        kw = {"dropout_rate": dropout_rate} if dropout_rate is not None else {}
        if tiny:
            kw.update(layer_specs=_TINY_FT_SPECS, stem_width=8)
        model = WrapperI3D(num_classes=num_classes, dtype=_dtype(dtype), **kw)
    elif arch == "r3d_18":
        model = R3D18(num_classes=num_classes, dtype=_dtype(dtype))
    elif arch == "mvitv2":
        model = MViTv2S(num_classes=num_classes, dtype=_dtype(dtype))
    else:
        raise ValueError(
            f"Architecture {arch!r} invalid for ft_model. Try 'i3d', 'largei3d', 'mvitv2', or 'r3d_18'"
        )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    t, h, w = clip_shape
    dummy = jnp.zeros((1, t, h, w, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(rng, dummy, train=False)
    return model, _maybe_restore(variables, saved_model_file, "ft_model_state_dict")


def load_fb_model(
    arch: str = "r50",
    saved_model_file: str | None = None,
    num_pa: int = 7,
    ssl: bool = False,
    *,
    rng: jax.Array | None = None,
    image_size: tuple[int, int] = (224, 224),
    dtype: str | None = "bfloat16",
    tiny: bool = False,
):
    """Privacy model factory (model_loaders.py:94-121). Returns (module, variables)."""
    if arch != "r50":
        raise ValueError(f"Architecture {arch!r} invalid for fb_model. Try 'r50'")
    kw: dict = {"layers": (1, 1, 1, 1), "width": 8} if tiny else {}
    model = (
        ResNet50SSL(dtype=_dtype(dtype), **kw)
        if ssl
        else ResNet50Classifier(num_pa, dtype=_dtype(dtype), **kw)
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, *image_size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(rng, dummy, train=False)
    return model, _maybe_restore(variables, saved_model_file, "fb_model_state_dict")


def load_mgfn_model(
    params=None,
    saved_model_file: str | None = None,
    *,
    rng: jax.Array | None = None,
    ncrops: int = 10,
):
    """MGFN factory (anomaly_detection_mgfn/main.py:60). Returns (module, variables)."""
    from ted_spad_tpu.config.params import MGFNParams

    p = params or MGFNParams()
    model = MGFN(
        feature_size=p.feature_size,
        dims=tuple(p.dims),
        depths=tuple(p.depths),
        mgfn_types=tuple(p.mgfn_types),
        local_kernel=p.local_kernel,
        ff_repe=p.ff_repe,
        dim_head=p.dim_head,
        mag_ratio=p.mag_ratio,
        dropout_rate=p.dropout_rate,
        k=p.k,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(p.seed)
    dummy = jnp.zeros((2, ncrops, p.seg_length, p.feature_size + 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "inference"))(rng, dummy, train=False)
    return model, _maybe_restore(variables, saved_model_file, "mgfn_model_state_dict")
