"""Metric parity against scikit-learn (the reference's metric backend)."""

import numpy as np
import pytest
from sklearn import metrics as skm

from ted_spad_tpu.ops import metrics, temporal


@pytest.mark.parametrize("n", [50, 500])
def test_roc_auc_matches_sklearn(rng, n):
    labels = (rng.random(n) > 0.7).astype(int)
    scores = rng.random(n)
    fpr, tpr, _ = skm.roc_curve(labels, scores, drop_intermediate=False)
    ref = skm.auc(fpr, tpr)
    assert metrics.roc_auc(labels, scores) == pytest.approx(ref, abs=1e-10)


def test_roc_auc_with_ties(rng):
    labels = (rng.random(200) > 0.5).astype(int)
    scores = np.round(rng.random(200), 1)  # heavy ties
    fpr, tpr, _ = skm.roc_curve(labels, scores)
    assert metrics.roc_auc(labels, scores) == pytest.approx(skm.auc(fpr, tpr), abs=1e-10)


def test_pr_auc_matches_sklearn(rng):
    labels = (rng.random(300) > 0.8).astype(int)
    scores = rng.random(300)
    precision, recall, _ = skm.precision_recall_curve(labels, scores)
    ref = skm.auc(recall, precision)
    assert metrics.pr_auc(labels, scores) == pytest.approx(ref, abs=1e-10)


def test_average_precision_matches_sklearn(rng):
    labels = (rng.random(200) > 0.6).astype(int)
    scores = rng.random(200)
    assert metrics.average_precision(labels, scores) == pytest.approx(
        skm.average_precision_score(labels, scores), abs=1e-10
    )


def test_macro_ap_cmap(rng):
    labels = (rng.random((100, 7)) > 0.7).astype(int)
    scores = rng.random((100, 7))
    cmap, per_class = metrics.macro_average_precision(labels, scores)
    ref = np.mean([skm.average_precision_score(labels[:, c], scores[:, c]) for c in range(7)])
    assert cmap == pytest.approx(ref, abs=1e-10)
    assert per_class.shape == (7,)


def test_multilabel_prf1(rng):
    labels = (rng.random((50, 7)) > 0.5).astype(int)
    scores = rng.random((50, 7))
    p, r, f1 = metrics.multilabel_prf1(labels, scores)
    ref_p = skm.precision_score(labels, scores > 0.5, average="macro", zero_division=0)
    ref_r = skm.recall_score(labels, scores > 0.5, average="macro", zero_division=0)
    assert p == pytest.approx(ref_p, abs=1e-9)
    assert r == pytest.approx(ref_r, abs=1e-9)
    assert 0 <= f1 <= 1


def test_frame_level_scores_exact_and_ratio():
    clip_scores = np.array([0.1, 0.9, 0.5])
    exact = metrics.frame_level_scores(clip_scores, 96)
    assert exact.shape == (96,)
    assert np.all(exact[:32] == np.float32(0.1))
    # Mismatched gt length: reference ratio-redistribution fallback (test.py:38-43).
    off = metrics.frame_level_scores(clip_scores, 100)
    assert off.shape == (100,)
    assert off[0] == np.float32(0.1) and off[-1] == np.float32(0.5)


def test_process_feat_reference_semantics():
    # Independent check of utils/utils.py:34-42 semantics.
    feat = np.arange(10, dtype=np.float32)[:, None].repeat(4, axis=1)
    out = temporal.process_feat(feat, 32)
    assert out.shape == (32, 4)
    r = np.linspace(0, 10, 33, dtype=int)
    for i in range(32):
        if r[i] != r[i + 1]:
            assert out[i, 0] == pytest.approx(feat[r[i] : r[i + 1], 0].mean())
    # Long-sequence downsampling path: every output row is the mean of its
    # linspace-delimited source span (utils/utils.py:34-42).
    feat2 = np.random.default_rng(1).random((100, 8)).astype(np.float32)
    out2 = temporal.process_feat(feat2, 32)
    assert out2.shape == (32, 8)
    r2 = np.linspace(0, 100, 33, dtype=int)
    for i in range(32):
        np.testing.assert_allclose(out2[i], feat2[r2[i] : r2[i + 1]].mean(0), atol=1e-6)


def test_segment_and_test_features():
    feats = np.random.default_rng(2).random((17, 2048)).astype(np.float32)
    train = temporal.segment_train_features(feats, 32)
    assert train.shape == (1, 32, 2049)
    mag = np.linalg.norm(train[0, 0, :2048])
    assert train[0, 0, 2048] == pytest.approx(mag, rel=1e-5)
    test = temporal.test_features(feats)
    assert test.shape == (17, 1, 2049)
