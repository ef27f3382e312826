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


# ---------------------------------------------------------------------------
# UNet++ ImageNet r18 encoder seed (model_loaders.py:18-30, smp encoder_weights)
# ---------------------------------------------------------------------------


def _torch_resnet18_encoder():
    """torch ResNet-18 trunk with torchvision's exact state_dict naming (smp's resnet18
    encoder reuses it verbatim) — the oracle; torchvision is not in this image."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride=stride, bias=False), tnn.BatchNorm2d(planes)
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + r)

    class ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            inp = 64
            for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
                blocks = []
                for bi in range(2):
                    blocks.append(BasicBlock(inp, planes, stride if bi == 0 else 1))
                    inp = planes
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

        def stages(self, x):
            """smp encoder depth-4 feature pyramid: [input, /2 stem, /4 l1, /8 l2, /16 l3]."""
            feats = [x]
            x = self.relu(self.bn1(self.conv1(x)))
            feats.append(x)
            x = self.maxpool(x)
            for li in range(3):  # depth 4 stops after layer3
                x = getattr(self, f"layer{li + 1}")(x)
                feats.append(x)
            return feats

    return ResNet18()


@pytest.mark.slow
def test_unetpp_encoder_stage_parity():
    """Converted ImageNet-style r18 encoder must reproduce the torch feature pyramid
    stage-by-stage inside UNetPlusPlus.encoder — the default fa seed."""
    from ted_spad_tpu.models.resnet2d import ResNet2D
    from ted_spad_tpu.utils.torch_convert import convert_resnet2d

    tmodel = _torch_resnet18_encoder().eval()
    # Perturb BN running stats away from (0, 1) so eval-mode parity is meaningful.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    x = np.random.default_rng(0).normal(0, 0.5, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_feats = [f.numpy() for f in tmodel.stages(torch.from_numpy(x))]

    enc = ResNet2D(block="basic", layers=(2, 2, 2, 2), depth=4, dtype=jnp.float32)
    template = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    tree = convert_resnet2d(tmodel.state_dict(), "resnet18", depth=4)
    variables = {
        "params": {**template["params"], **tree["params"]},
        "batch_stats": {**template["batch_stats"], **tree["batch_stats"]},
    }
    feats = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(feats) == len(ref_feats) == 5
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=2e-4, rtol=1e-3
        )


@pytest.mark.slow
def test_unetpp_full_model_accepts_encoder_seed():
    """load_imagenet_into_unetpp merges cleanly into the full fa and the forward runs."""
    from ted_spad_tpu.models import load_fa_model
    from ted_spad_tpu.utils.torch_convert import load_imagenet_into_unetpp

    tmodel = _torch_resnet18_encoder()
    _, variables = load_fa_model(arch="unet++", image_size=(64, 64), dtype="float32")
    loaded = load_imagenet_into_unetpp(variables, tmodel.state_dict())
    # Encoder params actually replaced (stem kernel matches torch weight).
    ours = np.asarray(loaded["params"]["encoder"]["stem"]["conv"]["kernel"])
    theirs = tmodel.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(ours, theirs)
    from ted_spad_tpu.models import UNetPlusPlus

    out = UNetPlusPlus(dtype=jnp.float32).apply(loaded, jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# torchvision r3d_18 seed (model_loaders.py:200-215)
# ---------------------------------------------------------------------------


def _torch_r3d18(num_classes: int):
    """torchvision.models.video.r3d_18 architecture with its exact state_dict naming
    (stem.{0,1}, layerL.B.conv{1,2}.{0,1}, downsample.{0,1}, fc)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Sequential(
                tnn.Conv3d(inp, planes, 3, stride=stride, padding=1, bias=False),
                tnn.BatchNorm3d(planes),
                tnn.ReLU(),
            )
            self.conv2 = tnn.Sequential(
                tnn.Conv3d(planes, planes, 3, padding=1, bias=False), tnn.BatchNorm3d(planes)
            )
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(inp, planes, 1, stride=stride, bias=False), tnn.BatchNorm3d(planes)
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            return self.relu(self.conv2(self.conv1(x)) + r)

    class VideoResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3), bias=False),
                tnn.BatchNorm3d(64),
                tnn.ReLU(),
            )
            inp = 64
            for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
                blocks = []
                for bi in range(2):
                    blocks.append(BasicBlock(inp, planes, stride if bi == 0 else 1))
                    inp = planes
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.stem(x)
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            x = x.mean(dim=(2, 3, 4))
            return self.fc(x)

    return VideoResNet()


@pytest.mark.slow
def test_r3d18_full_forward_parity():
    """torch r3d_18 oracle (eval) vs converted R3D18 — logits to float tolerance."""
    from ted_spad_tpu.models import R3D18
    from ted_spad_tpu.utils.torch_convert import load_r3d18_weights

    tmodel = _torch_r3d18(num_classes=400).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    x = np.random.default_rng(1).normal(0, 0.5, (2, 3, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = R3D18(num_classes=400, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)))
    variables = load_r3d18_weights(template, tmodel.state_dict(), num_classes=400)
    logits, feat = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    assert feat.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# torchvision mvit_v2_s seed (model_loaders.py:217-232)
# ---------------------------------------------------------------------------


def _torch_mvitv2(depths, dims, heads, kv_strides, input_thw, num_classes):
    """torchvision.models.video.mvit_v2_s architecture with its exact state_dict naming
    (conv_proj, pos_encoding.class_token, blocks.{i}.{norm1,attn.*,project,norm2,mlp},
    norm, head.1) — v2 semantics: per-head pooled q/k/v with shared LayerNorm(head_dim),
    decomposed rel-pos, residual pooling without the cls row, skip projection from the
    norm1 output (proj_after_attn)."""
    import torch.nn as tnn

    def rel_1d(q_size, k_size, table):
        ratio_q = max(k_size / q_size, 1.0)
        ratio_k = max(q_size / k_size, 1.0)
        qi = torch.arange(q_size)[:, None] * ratio_q
        ki = torch.arange(k_size)[None, :] * ratio_k
        rel = (qi - ki) + (k_size - 1) * ratio_k
        return table[rel.long()]

    class Pool(tnn.Module):
        def __init__(self, head_dim, stride):
            super().__init__()
            self.stride = stride
            self.pool = tnn.Conv3d(head_dim, head_dim, 3, stride=stride, padding=1,
                                   groups=head_dim, bias=False)
            self.norm_act = tnn.Sequential(tnn.LayerNorm(head_dim))

        def forward(self, x, thw):  # x: (B, heads, N, head_dim)
            b, h, n, d = x.shape
            cls, grid = x[:, :, :1], x[:, :, 1:]
            t, hh, ww = thw
            grid = grid.reshape(b * h, t, hh, ww, d).permute(0, 4, 1, 2, 3)
            grid = self.pool(grid)
            nt, nh, nw = grid.shape[2:]
            grid = grid.permute(0, 2, 3, 4, 1).reshape(b, h, -1, d)
            return self.norm_act(torch.cat([cls, grid], dim=2)), (nt, nh, nw)

    class Attention(tnn.Module):
        def __init__(self, dim_in, dim_out, n_heads, q_stride, kv_stride, thw):
            super().__init__()
            self.heads, self.dim_out = n_heads, dim_out
            hd = dim_out // n_heads
            self.qkv = tnn.Linear(dim_in, 3 * dim_out)
            self.pool_q = Pool(hd, q_stride)
            self.pool_k = Pool(hd, kv_stride)
            self.pool_v = Pool(hd, kv_stride)
            self.project = tnn.Linear(dim_out, dim_out)
            qt = [max(1, s // q) for s, q in zip(thw, q_stride)]
            kt = [max(1, s // q) for s, q in zip(thw, kv_stride)]
            for ax, qs, ks in zip("thw", qt, kt):
                self.register_parameter(
                    f"rel_pos_{ax}",
                    tnn.Parameter(torch.randn(2 * max(qs, ks) - 1, hd) * 0.02),
                )

        def forward(self, x, thw):
            b, n, _ = x.shape
            hd = self.dim_out // self.heads
            qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q, q_thw = self.pool_q(q, thw)
            k, k_thw = self.pool_k(k, thw)
            v, _ = self.pool_v(v, thw)
            attn = (q * hd ** -0.5) @ k.transpose(2, 3)
            qt, qh, qw = q_thw
            kt, kh, kw = k_thw
            r_q = q[:, :, 1:].reshape(b, self.heads, qt, qh, qw, hd)
            bias = (
                torch.einsum("bhtxyd,tkd->bhtxyk", r_q, rel_1d(qt, kt, self.rel_pos_t))[..., :, None, None]
                + torch.einsum("bhtxyd,xkd->bhtxyk", r_q, rel_1d(qh, kh, self.rel_pos_h))[..., None, :, None]
                + torch.einsum("bhtxyd,ykd->bhtxyk", r_q, rel_1d(qw, kw, self.rel_pos_w))[..., None, None, :]
            ).reshape(b, self.heads, qt * qh * qw, kt * kh * kw)
            attn[:, :, 1:, 1:] = attn[:, :, 1:, 1:] + bias
            attn = attn.softmax(dim=-1)
            out = attn @ v
            out[:, :, 1:] = out[:, :, 1:] + q[:, :, 1:]  # residual pool, no cls
            out = out.transpose(1, 2).reshape(b, -1, self.dim_out)
            return self.project(out), q_thw

    class Block(tnn.Module):
        def __init__(self, dim_in, dim_out, n_heads, q_stride, kv_stride, thw):
            super().__init__()
            self.q_stride = q_stride
            self.norm1 = tnn.LayerNorm(dim_in)
            self.attn = Attention(dim_in, dim_out, n_heads, q_stride, kv_stride, thw)
            self.project = tnn.Linear(dim_in, dim_out) if dim_in != dim_out else None
            self.norm2 = tnn.LayerNorm(dim_out)
            self.mlp = tnn.Sequential(
                tnn.Linear(dim_out, 4 * dim_out), tnn.GELU(), tnn.Dropout(0.0),
                tnn.Linear(4 * dim_out, dim_out), tnn.Dropout(0.0),
            )

        def forward(self, x, thw):
            xn = self.norm1(x)
            xa, new_thw = self.attn(xn, thw)
            skip = x if self.project is None else self.project(xn)
            if tuple(self.q_stride) != (1, 1, 1):
                b, n, c = skip.shape
                t, hh, ww = thw
                cls, grid = skip[:, :1], skip[:, 1:]
                grid = grid.reshape(b, t, hh, ww, c).permute(0, 4, 1, 2, 3)
                kernel = [s + 1 if s > 1 else 1 for s in self.q_stride]
                grid = torch.nn.functional.max_pool3d(
                    grid, kernel, stride=self.q_stride, padding=[k // 2 for k in kernel]
                )
                grid = grid.permute(0, 2, 3, 4, 1).reshape(b, -1, c)
                skip = torch.cat([cls, grid], dim=1)
            x = skip + xa
            return x + self.mlp(self.norm2(x)), new_thw

    class MViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_proj = tnn.Conv3d(3, dims[0], (3, 7, 7), stride=(2, 4, 4), padding=(1, 3, 3))

            class PosEnc(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.class_token = tnn.Parameter(torch.zeros(dims[0]))

            self.pos_encoding = PosEnc()
            blocks = []
            thw = list(input_thw)
            dim_in = dims[0]
            for si, depth in enumerate(depths):
                for bi in range(depth):
                    trans = si > 0 and bi == 0
                    q_stride = (1, 2, 2) if trans else (1, 1, 1)
                    blocks.append(Block(dim_in, dims[si], heads[si], q_stride, kv_strides[si], tuple(thw)))
                    dim_in = dims[si]
                    thw = [max(1, s // q) for s, q in zip(thw, q_stride)]
            self.blocks = tnn.ModuleList(blocks)
            self.norm = tnn.LayerNorm(dims[-1])
            self.head = tnn.Sequential(tnn.Dropout(0.0), tnn.Linear(dims[-1], num_classes))

        def forward(self, x):
            x = self.conv_proj(x)
            b, c, t, h, w = x.shape
            x = x.flatten(2).transpose(1, 2)  # (B, THW, C)
            cls = self.pos_encoding.class_token.expand(b, -1).unsqueeze(1)
            x = torch.cat([cls, x], dim=1)
            thw = (t, h, w)
            for blk in self.blocks:
                x, thw = blk(x, thw)
            x = self.norm(x)
            return self.head(x[:, 0])

    return MViT()


@pytest.mark.slow
def test_mvitv2_full_forward_parity():
    """torch MViTv2 oracle (torchvision layout, eval) vs converted flax MViTv2S — logits
    parity validates mvit.py numerics + the converter for the first time."""
    from ted_spad_tpu.models.mvit import MViTv2Config, MViTv2S
    from ted_spad_tpu.utils.torch_convert import convert_mvitv2

    depths, dims, hs = (1, 2), (8, 16), (1, 2)
    kv_strides = ((1, 2, 2), (1, 1, 1))
    tmodel = _torch_mvitv2(depths, dims, hs, kv_strides, (4, 8, 8), num_classes=11).eval()
    with torch.no_grad():  # non-trivial weights everywhere
        for p in tmodel.parameters():
            if p.ndim == 1 and p.abs().sum() == 0:
                p.normal_(0, 0.02)
    x = np.random.default_rng(2).normal(0, 0.5, (2, 3, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = MViTv2S(
        num_classes=11,
        config=MViTv2Config(depths=depths, dims=dims, heads=hs, kv_strides=kv_strides),
        dtype=jnp.float32,
    )
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)))
    tree = convert_mvitv2(tmodel.state_dict(), depths=depths, include_head=True)
    # Strict structural agreement: the converted tree must cover the whole template.
    t_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(template["params"])}
    c_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(tree["params"])}
    assert t_paths == c_paths, t_paths.symmetric_difference(c_paths)
    for (p1, l1), (p2, l2) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(template["params"]), key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(tree["params"]), key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        assert np.asarray(l1).shape == np.asarray(l2).shape, (jax.tree_util.keystr(p1), l1.shape, l2.shape)

    logits, feat = model.apply({"params": tree["params"]}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    assert feat.shape == (2, dims[-1])
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Real-torchvision validation (VERDICT r2 #6/#9): the oracles above are hand-built
# re-derivations of torchvision's layout; when an environment HAS torchvision these
# tests validate the naming contract against the genuine models automatically.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_r3d18_parity_against_real_torchvision():
    torchvision = pytest.importorskip("torchvision")
    from ted_spad_tpu.models import R3D18
    from ted_spad_tpu.utils.torch_convert import load_r3d18_weights

    tmodel = torchvision.models.video.r3d_18(weights=None, num_classes=400).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    x = np.random.default_rng(7).normal(0, 0.5, (2, 3, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = R3D18(num_classes=400, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)))
    variables = load_r3d18_weights(template, tmodel.state_dict(), num_classes=400)
    logits, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_mvitv2_parity_against_real_torchvision():
    """Genuine torchvision mvit_v2_s (fixed 16x224x224 input) vs the default-config flax
    MViTv2S through load_mvitv2_weights — validates the converter naming contract that
    the hand-built oracle (test_mvitv2_full_forward_parity) can only approximate."""
    torchvision = pytest.importorskip("torchvision")
    from ted_spad_tpu.models.mvit import MViTv2S
    from ted_spad_tpu.utils.torch_convert import load_mvitv2_weights

    tmodel = torchvision.models.video.mvit_v2_s(weights=None).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim == 1 and p.abs().sum() == 0:
                p.normal_(0, 0.02)
    x = np.random.default_rng(8).normal(0, 0.5, (1, 3, 16, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = MViTv2S(num_classes=400, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3)))
    variables = load_mvitv2_weights(template, tmodel.state_dict(), num_classes=400)
    logits, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-3, rtol=1e-3)
