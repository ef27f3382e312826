"""Loss parity tests against independent torch/numpy formulations of the reference losses."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ted_spad_tpu.ops import losses


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    ours = float(losses.cross_entropy_loss(logits, labels))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(6, 7)).astype(np.float32)
    targets = (rng.random(size=(6, 7)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits_loss(logits, targets))
    ref = float(F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(targets)))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_l1_matches_torch(rng):
    a = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    b = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    assert float(losses.l1_loss(a, b)) == pytest.approx(
        float(F.l1_loss(torch.tensor(a), torch.tensor(b))), abs=1e-6
    )


def test_triplet_matches_torch(rng):
    a, p, n = (rng.normal(size=(8, 128)).astype(np.float32) for _ in range(3))
    ours = float(losses.triplet_margin_loss(a, p, n, margin=1.0))
    ref = float(
        torch.nn.TripletMarginLoss(margin=1.0)(torch.tensor(a), torch.tensor(p), torch.tensor(n))
    )
    assert ours == pytest.approx(ref, abs=1e-5)


def _nt_xent_torch(zis, zjs, temperature, use_cosine):
    """Independent torch reimplementation of nt_xent_original.py:49-70 for parity checking."""
    b = zis.shape[0]
    reps = torch.cat([zjs, zis], dim=0)
    if use_cosine:
        reps_n = F.normalize(reps, dim=-1)
        sim = reps_n @ reps_n.T
    else:
        sim = reps @ reps.T
    l_pos = torch.diag(sim, b)
    r_pos = torch.diag(sim, -b)
    positives = torch.cat([l_pos, r_pos]).view(2 * b, 1)
    mask = ~(
        torch.eye(2 * b, dtype=torch.bool)
        | torch.diag(torch.ones(b, dtype=torch.bool), b)
        | torch.diag(torch.ones(b, dtype=torch.bool), -b)
    )
    negatives = sim[mask].view(2 * b, -1)
    logits = torch.cat([positives, negatives], dim=1) / temperature
    labels = torch.zeros(2 * b, dtype=torch.long)
    return float(F.cross_entropy(logits, labels, reduction="sum") / (2 * b))


@pytest.mark.parametrize("use_cosine", [False, True])
def test_nt_xent_matches_reference_formula(rng, use_cosine):
    zis = rng.normal(size=(6, 32)).astype(np.float32)
    zjs = rng.normal(size=(6, 32)).astype(np.float32)
    ours = float(losses.nt_xent_loss(zis, zjs, temperature=0.1, use_cosine_similarity=use_cosine))
    ref = _nt_xent_torch(torch.tensor(zis), torch.tensor(zjs), 0.1, use_cosine)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_nt_xent_identical_views_low_loss(rng):
    """Sanity: identical views with high-norm embeddings -> near-zero loss."""
    z = losses.l2_normalize(rng.normal(size=(8, 64)).astype(np.float32)) * 10
    low = float(losses.nt_xent_loss(z, z, temperature=0.1))
    high = float(
        losses.nt_xent_loss(z, losses.l2_normalize(rng.normal(size=(8, 64)).astype(np.float32)) * 10)
    )
    assert low < high


def test_smoothness_and_sparsity(rng):
    s = rng.random(size=(64,)).astype(np.float32)
    t = torch.tensor(s)
    ref_sparse = float(8e-3 * torch.mean(torch.norm(t, dim=0)))
    assert float(losses.sparsity_loss(s)) == pytest.approx(ref_sparse, abs=1e-6)
    t2 = torch.zeros_like(t)
    t2[:-1] = t[1:]
    t2[-1] = t[-1]
    ref_smooth = float(8e-4 * torch.sum((t2 - t) ** 2))
    assert float(losses.smoothness_loss(s)) == pytest.approx(ref_smooth, abs=1e-6)


def test_magnitude_contrastive_matches_torch(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32) * 50
    y = rng.normal(size=(5, 3)).astype(np.float32) * 50
    for label in (0.0, 1.0):
        d = F.pairwise_distance(torch.tensor(x), torch.tensor(y), keepdim=True)
        ref = float(
            torch.mean(
                (1 - label) * d.pow(2)
                + label * torch.clamp(200.0 - d, min=0.0).pow(2)
            )
        )
        ours = float(losses.magnitude_contrastive_loss(x, y, label))
        assert ours == pytest.approx(ref, rel=1e-4)


def test_mgfn_loss_composition(rng):
    b, ncrops, k, f = 4, 1, 3, 16
    sn = rng.random(size=(b, 1)).astype(np.float32)
    sa = rng.random(size=(b, 1)).astype(np.float32)
    nor = rng.normal(size=(b * ncrops, k, f)).astype(np.float32)
    abn = rng.normal(size=(b * ncrops, k, f)).astype(np.float32)
    nlabel = np.zeros((b,), np.float32)
    alabel = np.ones((b,), np.float32)

    out = float(losses.mgfn_loss(sn, sa, nlabel, alabel, nor, abn))

    # Independent composition per train.py:57-75.
    score = torch.tensor(np.concatenate([sn, sa]).reshape(-1))
    label = torch.tensor(np.concatenate([nlabel, alabel]))
    loss_cls = float(F.binary_cross_entropy(score, label))

    def contrast(o1, o2, lab):
        d = F.pairwise_distance(o1, o2, keepdim=True)
        return torch.mean((1 - lab) * d.pow(2) + lab * torch.clamp(200.0 - d, min=0).pow(2))

    abn_m = torch.norm(torch.tensor(abn), p=1, dim=2)
    nor_m = torch.norm(torch.tensor(nor), p=1, dim=2)
    half = abn_m.shape[0] // 2
    ref = loss_cls + float(
        (
            0.001 * contrast(abn_m, nor_m, 1)
            + contrast(abn_m[half:], abn_m[:half], 0)
            + contrast(nor_m[half:], nor_m[:half], 0)
        )
        * 0.001
    )
    assert out == pytest.approx(ref, rel=1e-4)
