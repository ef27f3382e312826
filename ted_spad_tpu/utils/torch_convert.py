"""torch -> flax pretrained-weight conversion.

The reference seeds models from torch checkpoints: Kinetics I3Res50
(``i3d_r50_kinetics.pth``, model_loaders.py:192), ImageNet InceptionI3d
(``rgb_imagenet.pt``, :178), torchvision ImageNet resnet50 (:159-161) and the smp
UNet++ ImageNet resnet18 encoder (:21-23). This module converts those state_dicts into
this package's flax variable trees so parity runs start from identical weights.

Layout rules: conv2d (O,I,kh,kw)->(kh,kw,I,O); conv3d (O,I,kt,kh,kw)->(kt,kh,kw,I,O);
linear (O,I)->(I,O); BN weight/bias->scale/bias (params), running_mean/var->mean/var
(batch_stats). Loading is via numpy state_dicts — pass ``torch.load(...,
map_location='cpu')`` output or an ``.npz``; torch itself is only needed to read ``.pth``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    a = _np(t)
    if a.ndim == 4:
        return a.transpose(2, 3, 1, 0)
    if a.ndim == 5:
        return a.transpose(2, 3, 4, 1, 0)
    raise ValueError(f"unexpected conv kernel rank {a.ndim}")


def linear_kernel(t) -> np.ndarray:
    return _np(t).transpose(1, 0)


def convbn_entry(sd: Mapping[str, Any], conv_key: str, bn_key: str | None):
    """(params, batch_stats) subtrees for one ConvBN given torch key prefixes."""
    params: dict[str, Any] = {"conv": {"kernel": conv_kernel(sd[conv_key + ".weight"])}}
    if conv_key + ".bias" in sd:
        params["conv"]["bias"] = _np(sd[conv_key + ".bias"])
    stats = {}
    if bn_key is not None:
        params["bn"] = {"scale": _np(sd[bn_key + ".weight"]), "bias": _np(sd[bn_key + ".bias"])}
        stats["bn"] = {
            "mean": _np(sd[bn_key + ".running_mean"]),
            "var": _np(sd[bn_key + ".running_var"]),
        }
    return params, stats


def _merge(params, stats, name, entry):
    p, s = entry
    params[name] = p
    if s:
        stats[name] = s


# ---------------------------------------------------------------------------
# torchvision 2D ResNets -> ResNet2D (fb r50, UNet++ r18 encoder)
# ---------------------------------------------------------------------------

_RESNET_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}
_RESNET_BLOCK_CONVS = {"resnet18": 2, "resnet50": 3}


def convert_resnet2d(sd: Mapping[str, Any], arch: str = "resnet50", depth: int = 5):
    """torchvision resnet state_dict -> our ResNet2D {'params', 'batch_stats'} subtree
    (names: stem, layer{L}_{B}.conv{i}/downsample)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    _merge(params, stats, "stem", convbn_entry(sd, "conv1", "bn1"))
    n_convs = _RESNET_BLOCK_CONVS[arch]
    for li, n_blocks in enumerate(_RESNET_LAYERS[arch]):
        if li + 2 > depth:
            break
        for bi in range(n_blocks):
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            pre = f"layer{li + 1}.{bi}"
            for ci in range(1, n_convs + 1):
                _merge(bp, bs, f"conv{ci}", convbn_entry(sd, f"{pre}.conv{ci}", f"{pre}.bn{ci}"))
            if f"{pre}.downsample.0.weight" in sd:
                _merge(bp, bs, "downsample", convbn_entry(sd, f"{pre}.downsample.0", f"{pre}.downsample.1"))
            params[f"layer{li + 1}_{bi}"] = bp
            stats[f"layer{li + 1}_{bi}"] = bs
    return {"params": params, "batch_stats": stats}


def convert_resnet50_classifier(sd: Mapping[str, Any], replace_fc: bool = True):
    """torchvision resnet50 -> ResNet50Classifier variables. ``replace_fc`` keeps our
    randomly-initialized head (model_loaders.py:163-166 replaces fc)."""
    tree = convert_resnet2d(sd, "resnet50", depth=5)
    variables = {"params": {"backbone": tree["params"]}, "batch_stats": {"backbone": tree["batch_stats"]}}
    if not replace_fc and "fc.weight" in sd:
        variables["params"]["fc"] = {"kernel": linear_kernel(sd["fc.weight"]), "bias": _np(sd["fc.bias"])}
    return variables


# ---------------------------------------------------------------------------
# I3Res50 Kinetics seed -> WrapperI3D.i3d (model_loaders.py:185-197)
# ---------------------------------------------------------------------------

_I3_LAYERS = (3, 4, 6, 3)


def convert_i3res50(sd: Mapping[str, Any], include_fc: bool = False):
    """pytorch-resnet3d I3Res50 state_dict (conv1/bn1/layer{L}.{B}.conv{i}/fc; possibly
    with FrozenBN 'scale' keys — handled like model_loaders.py:80) -> i3d subtree."""
    sd = {k.replace(".scale", ".weight") if k.endswith(".scale") else k: v for k, v in sd.items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    _merge(params, stats, "stem", convbn_entry(sd, "conv1", "bn1"))
    for li, n_blocks in enumerate(_I3_LAYERS):
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            for ci in (1, 2, 3):
                _merge(bp, bs, f"conv{ci}", convbn_entry(sd, f"{pre}.conv{ci}", f"{pre}.bn{ci}"))
            if f"{pre}.downsample.0.weight" in sd:
                _merge(bp, bs, "downsample", convbn_entry(sd, f"{pre}.downsample.0", f"{pre}.downsample.1"))
            params[f"blocks_layer{li + 1}_{bi}"] = bp
            stats[f"blocks_layer{li + 1}_{bi}"] = bs
    if include_fc and "fc.weight" in sd:
        params["fc"] = {"kernel": linear_kernel(sd["fc.weight"]), "bias": _np(sd["fc.bias"])}
    return {"params": params, "batch_stats": stats}


def load_kinetics_into_wrapper(variables, sd: Mapping[str, Any], num_classes: int):
    """build_largei3d_classifier semantics (model_loaders.py:185-197): load the Kinetics
    backbone into wrapper.i3d, keep our fresh fc (replaced when classes != 400) + mlp."""
    tree = convert_i3res50(sd, include_fc=(num_classes == 400))
    new_params = dict(variables["params"])
    i3d_params = dict(new_params["i3d"])
    i3d_params.update(tree["params"])
    new_params["i3d"] = i3d_params
    new_stats = dict(variables.get("batch_stats", {}))
    i3d_stats = dict(new_stats.get("i3d", {}))
    i3d_stats.update(tree["batch_stats"])
    new_stats["i3d"] = i3d_stats
    return {**variables, "params": new_params, "batch_stats": new_stats}


# ---------------------------------------------------------------------------
# InceptionI3d rgb_imagenet.pt -> InceptionI3d (model_loaders.py:171-182)
# ---------------------------------------------------------------------------

_I3D_BRANCHES = {"b0": "b0", "b1a": "b1a", "b1b": "b1b", "b2a": "b2a", "b2b": "b2b", "b3b": "b3b"}


def _unit3d(sd, prefix: str):
    params: dict[str, Any] = {"conv3d": {"kernel": conv_kernel(sd[prefix + ".conv3d.weight"])}}
    if prefix + ".conv3d.bias" in sd:
        params["conv3d"]["bias"] = _np(sd[prefix + ".conv3d.bias"])
    stats = {}
    if prefix + ".bn.weight" in sd:
        params["bn"] = {"scale": _np(sd[prefix + ".bn.weight"]), "bias": _np(sd[prefix + ".bn.bias"])}
        stats["bn"] = {
            "mean": _np(sd[prefix + ".bn.running_mean"]),
            "var": _np(sd[prefix + ".bn.running_var"]),
        }
    return params, stats


def convert_inception_i3d(sd: Mapping[str, Any], include_logits: bool = False):
    """Official I3D checkpoint naming (Conv3d_1a_7x7.conv3d.*, Mixed_3b.b0.conv3d.*...)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for ours, theirs in (("conv_1a", "Conv3d_1a_7x7"), ("conv_2b", "Conv3d_2b_1x1"), ("conv_2c", "Conv3d_2c_3x3")):
        _merge(params, stats, ours, _unit3d(sd, theirs))
    for ep in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        for branch in _I3D_BRANCHES:
            _merge(bp, bs, branch, _unit3d(sd, f"{ep}.{branch}"))
        params[f"mixed_{ep}"] = bp
        stats[f"mixed_{ep}"] = bs
    if include_logits and "logits.conv3d.weight" in sd:
        params["logits_conv"] = {
            "kernel": conv_kernel(sd["logits.conv3d.weight"]),
            "bias": _np(sd["logits.conv3d.bias"]),
        }
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Read a .pth/.pt with torch (CPU) or a converted .npz."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and all(hasattr(v, "shape") for v in obj.values()):
        return obj
    for key in ("state_dict", "model_state_dict", "fa_model_state_dict", "ft_model_state_dict", "fb_model_state_dict"):
        if isinstance(obj, dict) and key in obj:
            return obj[key]
    raise ValueError(f"unrecognized checkpoint structure in {path}")
