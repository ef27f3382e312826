"""torch-CPU oracle tests for the central compute paths: I3Res50 full forward and the
loss functions (torch implements the reference's exact criteria, so matching torch ==
matching the reference's numerics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class TestLossOracles:
    def test_triplet_matches_torch(self):
        from ted_spad_tpu.ops.losses import triplet_margin_loss

        rng = np.random.default_rng(0)
        a, p_, n = (rng.normal(0, 1, (6, 128)).astype(np.float32) for _ in range(3))
        ours = float(triplet_margin_loss(jnp.asarray(a), jnp.asarray(p_), jnp.asarray(n), margin=1.0))
        ref = float(
            torch.nn.TripletMarginLoss(margin=1.0)(
                torch.from_numpy(a), torch.from_numpy(p_), torch.from_numpy(n)
            )
        )
        assert ours == pytest.approx(ref, abs=1e-5)

    def test_nt_xent_matches_naive_torch(self):
        """Direct NT-Xent oracle: CE over [positive | all 2B-2 negatives]/tau per sample."""
        from ted_spad_tpu.ops.losses import nt_xent_loss

        rng = np.random.default_rng(1)
        zi = rng.normal(0, 1, (5, 16)).astype(np.float32)
        zj = rng.normal(0, 1, (5, 16)).astype(np.float32)
        tau = 0.1
        ours = float(nt_xent_loss(jnp.asarray(zi), jnp.asarray(zj), temperature=tau))

        reps = torch.from_numpy(np.concatenate([zj, zi], 0))  # reference order
        sim = reps @ reps.T
        n = 10
        b = 5
        total = 0.0
        for i in range(n):
            pos = sim[i, (i + b) % n]
            negs = [sim[i, j] for j in range(n) if j != i and j != (i + b) % n]
            logits = torch.stack([pos] + negs) / tau
            total += torch.nn.functional.cross_entropy(logits[None], torch.zeros(1, dtype=torch.long))
        ref = float(total / n)
        assert ours == pytest.approx(ref, abs=1e-4)

    def test_bce_with_logits_matches_torch(self):
        from ted_spad_tpu.ops.losses import bce_with_logits_loss

        rng = np.random.default_rng(2)
        x = rng.normal(0, 3, (8, 7)).astype(np.float32)
        t = (rng.random((8, 7)) < 0.3).astype(np.float32)
        ours = float(bce_with_logits_loss(jnp.asarray(x), jnp.asarray(t)))
        ref = float(torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(t)))
        assert ours == pytest.approx(ref, abs=1e-6)


def _torch_i3res50(num_classes: int):
    """torch oracle for the inflated-3D ResNet-50 (pytorch-resnet3d naming): built from
    the architecture description in SURVEY.md §2.1 (stem (5,7,7)/s2, maxpools (2,3,3) &
    (2,1,1), temp_conv patterns per layer)."""
    import torch.nn as tnn

    specs = [
        (64, 3, 1, (1, 1, 1)),
        (128, 4, 2, (1, 0, 1, 0)),
        (256, 6, 2, (1, 0, 1, 0, 1, 0)),
        (512, 3, 2, (0, 1, 0)),
    ]

    class Bottleneck(tnn.Module):
        def __init__(self, inp, planes, stride, tc, down):
            super().__init__()
            self.conv1 = tnn.Conv3d(inp, planes, (1 + 2 * tc, 1, 1), padding=(tc, 0, 0), bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(planes, planes, (1, 3, 3), stride=(1, stride, stride), padding=(0, 1, 1), bias=False)
            self.bn2 = tnn.BatchNorm3d(planes)
            self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm3d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if down:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(inp, planes * 4, 1, stride=(1, stride, stride), bias=False),
                    tnn.BatchNorm3d(planes * 4),
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + r)

    class I3Res50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv3d(3, 64, (5, 7, 7), stride=2, padding=(2, 3, 3), bias=False)
            self.bn1 = tnn.BatchNorm3d(64)
            self.relu = tnn.ReLU()
            self.mp1 = tnn.MaxPool3d((2, 3, 3), stride=2)
            self.mp2 = tnn.MaxPool3d((2, 1, 1), stride=(2, 1, 1))
            inp = 64
            for li, (planes, n, stride, tcs) in enumerate(specs):
                blocks = []
                for bi in range(n):
                    s = stride if bi == 0 else 1
                    down = bi == 0 and (s != 1 or inp != planes * 4)
                    blocks.append(Bottleneck(inp, planes, s, tcs[bi], down))
                    inp = planes * 4
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.mp1(self.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            x = self.mp2(x)
            x = self.layer2(x)
            x = self.layer3(x)
            x = self.layer4(x)
            feat = x.mean(dim=(2, 3, 4))
            return self.fc(feat), feat

    return I3Res50()


@pytest.mark.slow
def test_i3res50_full_forward_parity():
    """Kinetics-layout torch I3Res50 (random init, eval) converted into WrapperI3D.i3d —
    logits and 2048-d features must match torch."""
    from ted_spad_tpu.models import WrapperI3D
    from ted_spad_tpu.utils.torch_convert import load_kinetics_into_wrapper

    tmodel = _torch_i3res50(num_classes=9).eval()
    x = np.random.default_rng(0).normal(0, 0.5, (2, 3, 16, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_feat = tmodel(torch.from_numpy(x))

    model = WrapperI3D(num_classes=9, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3)))
    sd = {**tmodel.state_dict()}
    # Map oracle fc -> wrapper i3d fc (num_classes == 9 != 400 normally replaces it; here
    # we want full parity so convert with include_fc via a 400-class-style load).
    variables = load_kinetics_into_wrapper(template, sd, num_classes=400)
    variables["params"]["i3d"]["fc"] = {
        "kernel": jnp.asarray(sd["fc.weight"].numpy().T),
        "bias": jnp.asarray(sd["fc.bias"].numpy()),
    }
    logits, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    feat = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), method="extract_features")
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=5e-4, rtol=1e-3)


def test_supcon_matches_naive():
    """SupCon (Khosla et al.) vs a direct per-anchor computation."""
    import math

    from ted_spad_tpu.ops.losses import l2_normalize, supcon_loss

    rng = np.random.default_rng(0)
    f = l2_normalize(jnp.asarray(rng.normal(0, 1, (4, 2, 16)).astype(np.float32)), axis=-1)
    labels = jnp.asarray([0, 1, 0, 1])
    ours = float(supcon_loss(f, labels))
    ff = np.asarray(f).reshape(8, 16)
    ll = np.repeat([0, 1, 0, 1], 2)
    t = 0.07
    total = 0.0
    for i in range(8):
        sims = ff @ ff[i] / t
        sims = sims - sims.max()
        denom = sum(math.exp(sims[j]) for j in range(8) if j != i)
        pos = [j for j in range(8) if j != i and ll[j] == ll[i]]
        total += -sum(sims[j] - math.log(denom) for j in pos) / len(pos)
    assert ours == pytest.approx(total / 8, abs=1e-4)
