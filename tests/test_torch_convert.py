"""Pretrained-weight conversion parity: convert live torch models and compare forward
outputs numerically (torch CPU is the oracle — SURVEY.md §7 hard-parts list calls out
conv layout / padding fidelity as the risk)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class TestTensorRules:
    def test_conv2d_parity(self):
        import torch.nn as tnn

        from ted_spad_tpu.utils.torch_convert import conv_kernel

        tconv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
        x = np.random.default_rng(0).normal(0, 1, (2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()
        import flax.linen as nn

        conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        variables = {
            "params": {
                "kernel": jnp.asarray(conv_kernel(tconv.weight)),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
        out = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)

    def test_conv3d_parity(self):
        import torch.nn as tnn

        from ted_spad_tpu.utils.torch_convert import conv_kernel

        tconv = tnn.Conv3d(3, 4, (3, 3, 3), stride=(1, 2, 2), padding=(1, 1, 1), bias=False)
        x = np.random.default_rng(1).normal(0, 1, (1, 3, 4, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()
        import flax.linen as nn

        conv = nn.Conv(4, (3, 3, 3), strides=(1, 2, 2), padding=[(1, 1)] * 3, use_bias=False)
        variables = {"params": {"kernel": jnp.asarray(conv_kernel(tconv.weight))}}
        out = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-5)


def _torch_resnet50(num_classes: int):
    """Minimal torch ResNet-50 with torchvision's exact state_dict naming — the oracle
    (torchvision itself is not in this image)."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or inp != planes * 4:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes * 4, 1, stride=stride, bias=False), tnn.BatchNorm2d(planes * 4)
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + r)

    class ResNet50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            inp = 64
            for li, (planes, n, stride) in enumerate([(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
                blocks = []
                for bi in range(n):
                    blocks.append(Bottleneck(inp, planes, stride if bi == 0 else 1))
                    inp = planes * 4
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return ResNet50()


@pytest.mark.slow
def test_resnet50_full_forward_parity():
    """torch ResNet-50 oracle (random init, eval) vs converted ResNet50Classifier with the
    original fc — logits must match to float tolerance."""
    from ted_spad_tpu.models import ResNet50Classifier
    from ted_spad_tpu.utils.torch_convert import convert_resnet50_classifier

    tmodel = _torch_resnet50(num_classes=10).eval()
    x = np.random.default_rng(0).normal(0, 0.5, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = ResNet50Classifier(num_classes=10, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    converted = convert_resnet50_classifier(tmodel.state_dict(), replace_fc=False)
    variables = {
        "params": {**template["params"], **converted["params"]},
        "batch_stats": {**template["batch_stats"], **converted["batch_stats"]},
    }
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_i3res50_conversion_structure():
    """Kinetics-layout state_dict (synthesized at correct shapes) loads into WrapperI3D
    with strict tree/shape agreement and a live forward."""
    from ted_spad_tpu.models import WrapperI3D
    from ted_spad_tpu.utils.torch_convert import load_kinetics_into_wrapper

    model = WrapperI3D(num_classes=7, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 3)))

    # Synthesize a torch-layout state_dict by inverse-converting the template.
    sd = {}
    i3d_p = template["params"]["i3d"]
    i3d_s = template["batch_stats"]["i3d"]

    def put_convbn(prefix_t, tree_p, tree_s):
        k = np.asarray(tree_p["conv"]["kernel"])
        perm = (4, 3, 0, 1, 2) if k.ndim == 5 else (3, 2, 0, 1)
        sd[prefix_t + ".weight"] = torch.from_numpy(k.transpose(*perm).copy())
        return tree_s

    put_convbn("conv1", i3d_p["stem"], None)
    sd["bn1.weight"] = torch.from_numpy(np.asarray(i3d_p["stem"]["bn"]["scale"]))
    sd["bn1.bias"] = torch.from_numpy(np.asarray(i3d_p["stem"]["bn"]["bias"]))
    sd["bn1.running_mean"] = torch.from_numpy(np.asarray(i3d_s["stem"]["bn"]["mean"]))
    sd["bn1.running_var"] = torch.from_numpy(np.asarray(i3d_s["stem"]["bn"]["var"]))
    layers = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for lname, n in layers.items():
        for bi in range(n):
            bp = i3d_p[f"blocks_{lname}_{bi}"]
            bs = i3d_s[f"blocks_{lname}_{bi}"]
            for ci in (1, 2, 3):
                put_convbn(f"{lname}.{bi}.conv{ci}", bp[f"conv{ci}"], None)
                sd[f"{lname}.{bi}.bn{ci}.weight"] = torch.from_numpy(np.asarray(bp[f"conv{ci}"]["bn"]["scale"]))
                sd[f"{lname}.{bi}.bn{ci}.bias"] = torch.from_numpy(np.asarray(bp[f"conv{ci}"]["bn"]["bias"]))
                sd[f"{lname}.{bi}.bn{ci}.running_mean"] = torch.from_numpy(np.asarray(bs[f"conv{ci}"]["bn"]["mean"]))
                sd[f"{lname}.{bi}.bn{ci}.running_var"] = torch.from_numpy(np.asarray(bs[f"conv{ci}"]["bn"]["var"]))
            if "downsample" in bp:
                put_convbn(f"{lname}.{bi}.downsample.0", bp["downsample"], None)
                sd[f"{lname}.{bi}.downsample.1.weight"] = torch.from_numpy(np.asarray(bp["downsample"]["bn"]["scale"]))
                sd[f"{lname}.{bi}.downsample.1.bias"] = torch.from_numpy(np.asarray(bp["downsample"]["bn"]["bias"]))
                sd[f"{lname}.{bi}.downsample.1.running_mean"] = torch.from_numpy(np.asarray(bs["downsample"]["bn"]["mean"]))
                sd[f"{lname}.{bi}.downsample.1.running_var"] = torch.from_numpy(np.asarray(bs["downsample"]["bn"]["var"]))

    loaded = load_kinetics_into_wrapper(template, sd, num_classes=7)
    # Round-trip: converted tree must equal the template it was synthesized from.
    for path_leaf in zip(
        jax.tree_util.tree_leaves_with_path(template["params"]["i3d"]),
        jax.tree_util.tree_leaves_with_path(loaded["params"]["i3d"]),
    ):
        (p1, l1), (p2, l2) = path_leaf
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), err_msg=str(p1))
    out, emb = model.apply(loaded, jnp.ones((1, 16, 32, 32, 3)) * 0.5, train=False)
    assert np.isfinite(np.asarray(out)).all()
