"""Loss functions as pure JAX — every formula cites the reference implementation.

All losses are shape-static and jit-safe (masks built at trace time from static shapes; no
data-dependent control flow), so XLA fuses them into the surrounding train step. Reductions
accumulate in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch ``F.normalize(p=2)`` semantics: divide by max(norm, eps)."""
    n = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy with integer labels (train_anonymizer.py:347)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def bce_with_logits_loss(logits: Array, targets: Array) -> Array:
    """Mean sigmoid BCE over all elements (train_privacy.py:157, multi-label)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # Numerically stable: max(x,0) - x*t + log(1+exp(-|x|)).
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def bce_loss(probs: Array, targets: Array, eps: float = 1e-7) -> Array:
    """BCE on probabilities (MGFN scores are already sigmoid'd; train.py:52, 66)."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    t = targets.astype(jnp.float32)
    return jnp.mean(-(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)))


def l1_loss(pred: Array, target: Array) -> Array:
    """Mean absolute error (fa reconstruction pretraining, train_reconstruction.py:111)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def _pairwise_distance(x: Array, y: Array, p: float = 2.0, eps: float = 1e-6) -> Array:
    """Row-wise Lp distance with torch ``F.pairwise_distance`` semantics (adds eps to diff)."""
    d = x.astype(jnp.float32) - y.astype(jnp.float32) + eps
    return jnp.sum(jnp.abs(d) ** p, axis=-1) ** (1.0 / p)


def triplet_margin_loss(
    anchor: Array, positive: Array, negative: Array, margin: float = 1.0, p: float = 2.0
) -> Array:
    """torch ``nn.TripletMarginLoss(margin=1)`` (train_anonymizer.py:349-350).

    The temporally-distinct triplet loss of the paper: anchor/positive share frames, negative
    is a temporally-shifted clip of the same video; applied to 128-d mlp embeddings.
    """
    d_ap = _pairwise_distance(anchor, positive, p)
    d_an = _pairwise_distance(anchor, negative, p)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def nt_xent_loss(
    zis: Array,
    zjs: Array,
    temperature: float = 0.1,
    use_cosine_similarity: bool = False,
) -> Array:
    """SimCLR NT-Xent contrastive loss (aux_code/nt_xent_original.py:49-70).

    Reference semantics: representations = [zjs; zis]; positives are the +/-B diagonals;
    negatives are all off-(0,+B,-B)-diagonal entries; CE over [positive | negatives] / tau,
    summed then divided by 2B. Instantiated per-batch in the reference
    (train_anonymizer.py:82, temperature 0.1, dot-product similarity); here the masks are
    static functions of the traced shape so one jitted step serves every epoch.
    """
    b = zis.shape[0]
    reps = jnp.concatenate([zjs, zis], axis=0).astype(jnp.float32)  # (2B, D)
    if use_cosine_similarity:
        reps = l2_normalize(reps, axis=-1)
    # The (2B, 2B) similarity matmul is tiny but precision-sensitive (logits are sim / tau);
    # force full-f32 MXU passes rather than the default bf16-ish fast path.
    sim = jnp.matmul(reps, reps.T, precision=jax.lax.Precision.HIGHEST)

    n = 2 * b
    pos_u = jnp.diagonal(sim, offset=b)   # (B,)
    pos_l = jnp.diagonal(sim, offset=-b)  # (B,)
    positives = jnp.concatenate([pos_u, pos_l])[:, None]  # (2B, 1)

    eye = jnp.eye(n, dtype=bool)
    band = (
        eye
        | jnp.eye(n, k=b, dtype=bool)
        | jnp.eye(n, k=-b, dtype=bool)
    )
    # Negatives: full row with self/positive bands masked to -inf — exp(-inf)=0 makes this
    # exactly the reference's gather of the 2B-2 negatives, without a dynamic-shape gather.
    negatives = jnp.where(band, -jnp.inf, sim)

    logits = jnp.concatenate([positives / temperature, negatives / temperature], axis=1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])


def supcon_loss(
    features: Array, labels: Array, temperature: float = 0.07, base_temperature: float = 0.07
) -> Array:
    """Supervised contrastive loss (Khosla et al. 2020) over (B, V, D) L2-normalized
    multi-view features with integer labels.

    The reference's ``loss='con'`` path stacks two normalized ft features and calls
    ``criterion(feature, label)`` (train_action.py:60-65; train_anonymizer.py:95-101) —
    the SupConLoss signature; the shipped criterion is plain CE (train_action.py:225), so
    'con' is inert upstream. This implements the evident intent faithfully (SupContrast
    'all' contrast mode) so the config option is functional here.
    """
    b, v, _ = features.shape
    feats = features.astype(jnp.float32).reshape(b * v, -1)  # anchor = all views
    labels = jnp.repeat(labels.reshape(-1), v)
    sim = jnp.matmul(feats, feats.T, precision=jax.lax.Precision.HIGHEST) / temperature
    # Numerical stability: subtract per-row max (SupContrast logits trick).
    sim = sim - jax.lax.stop_gradient(sim.max(axis=1, keepdims=True))
    n = b * v
    self_mask = ~jnp.eye(n, dtype=bool)
    pos_mask = (labels[:, None] == labels[None, :]) & self_mask
    exp_sim = jnp.exp(sim) * self_mask
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-12)
    pos_count = jnp.maximum(pos_mask.sum(axis=1), 1)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / pos_count
    return jnp.mean(-(temperature / base_temperature) * mean_log_prob_pos)


# ---------------------------------------------------------------------------
# MGFN losses (anomaly_detection_mgfn/train.py)
# ---------------------------------------------------------------------------


def sparsity_loss(scores: Array, lam: float = 8e-3) -> Array:
    """L2 norm of abnormal snippet scores (train.py:8-10)."""
    return lam * jnp.linalg.norm(scores.astype(jnp.float32).reshape(-1))


def smoothness_loss(scores: Array, lam: float = 8e-4) -> Array:
    """Temporal smoothness: sum of squared successive diffs, last repeated (train.py:13-20)."""
    s = scores.astype(jnp.float32).reshape(-1)
    shifted = jnp.concatenate([s[1:], s[-1:]])
    return lam * jnp.sum((shifted - s) ** 2)


def magnitude_contrastive_loss(
    out1: Array, out2: Array, label: float, margin: float = 200.0
) -> Array:
    """Feature-magnitude contrastive loss (train.py:23-32).

    ``label=1`` pushes the two magnitude vectors at least ``margin`` apart (normal vs
    abnormal); ``label=0`` pulls them together (same class).
    """
    d = _pairwise_distance(out1, out2)
    return jnp.mean((1.0 - label) * d**2 + label * jnp.maximum(margin - d, 0.0) ** 2)


def mgfn_loss(
    score_normal: Array,
    score_abnormal: Array,
    nlabel: Array,
    alabel: Array,
    nor_feamagnitude: Array,
    abn_feamagnitude: Array,
    margin: float = 200.0,
) -> Array:
    """Composite MGFN loss (train.py:47-75).

    ``score_normal/score_abnormal``: (B, 1) top-k mean scores. ``*_feamagnitude``:
    (ncrops*B, k, F) selected snippet features. Composition is
    ``cls + (0.001*separate + cluster_a + cluster_n) * 0.001`` exactly as the reference.
    """
    label = jnp.concatenate([nlabel, alabel], axis=0).astype(jnp.float32)
    score = jnp.concatenate([score_normal, score_abnormal], axis=0).reshape(-1)
    loss_cls = bce_loss(score, label)

    abn_mag = jnp.linalg.norm(abn_feamagnitude.astype(jnp.float32), ord=1, axis=2)  # (N, k)
    nor_mag = jnp.linalg.norm(nor_feamagnitude.astype(jnp.float32), ord=1, axis=2)
    half = abn_mag.shape[0] // 2
    loss_con = magnitude_contrastive_loss(abn_mag, nor_mag, 1.0, margin)
    loss_con_n = magnitude_contrastive_loss(nor_mag[half:], nor_mag[:half], 0.0, margin)
    loss_con_a = magnitude_contrastive_loss(abn_mag[half:], abn_mag[:half], 0.0, margin)
    return loss_cls + (0.001 * loss_con + loss_con_a + loss_con_n) * 0.001
