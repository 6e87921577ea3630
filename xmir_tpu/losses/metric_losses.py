"""Deep metric-learning losses as pure jnp functions.

Behavioral parity targets (reference loss.py):
  triplet batch-all / batch-hard        loss.py:60-114
  SupervisedContrastive (single/multi)  loss.py:27-57
  WeightedMultiLabelTriplet             loss.py:151-227  (vectorized here —
                                        the reference loops per anchor)
  JaccardSupCon                         loss.py:230-284
  AsymmetricLoss (ASL)                  loss.py:311-344
  MultiLabelContrastive                 loss.py:347-384
  DualBranchMultiLabel                  loss.py:387-427
  TripletHashLoss                       ath_model.py:111-123

All functions are jit-safe (no data-dependent Python control flow) and operate
in float32 accumulations regardless of input dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def pairwise_distance(embeddings: jnp.ndarray, p: float = 2.0) -> jnp.ndarray:
    """Pairwise Lp distance matrix (matches torch.cdist for p=2)."""
    if p == 2.0:
        sq = jnp.sum(embeddings * embeddings, axis=1)
        d2 = jnp.maximum(
            sq[:, None] + sq[None, :] - 2.0 * (embeddings @ embeddings.T), 0.0
        )
        # safe sqrt: zero-distance entries (the diagonal) get gradient 0
        # instead of NaN from d/dx sqrt(x) at x=0
        zero = d2 <= 0.0
        d = jnp.sqrt(jnp.where(zero, 1.0, d2))
        return jnp.where(zero, 0.0, d)
    diff = jnp.abs(embeddings[:, None, :] - embeddings[None, :, :])
    return jnp.power(jnp.sum(jnp.power(diff, p), axis=-1), 1.0 / p)


# ---------------------------------------------------------------------------
# triplet losses (single-label)
# ---------------------------------------------------------------------------


def _triplet_mask(labels: jnp.ndarray) -> jnp.ndarray:
    """(B,B,B) mask of valid (a, p, n) triplets: distinct indices,
    label[a]==label[p], label[a]!=label[n]."""
    b = labels.shape[0]
    eye = jnp.eye(b, dtype=bool)
    not_eq = ~eye
    distinct = not_eq[:, :, None] & not_eq[:, None, :] & not_eq[None, :, :]
    label_eq = labels[None, :] == labels[:, None]
    valid = label_eq[:, :, None] & ~label_eq[:, None, :]
    return valid & distinct


def batch_all_triplet_loss(embeddings, labels, margin=1.0, p=2.0):
    """Mean loss over positive (loss>0) valid triplets; aux = fraction of
    positive triplets among valid ones (reference loss.py:88-114)."""
    dist = pairwise_distance(embeddings, p)
    tl = dist[:, :, None] - dist[:, None, :] + margin
    mask = _triplet_mask(labels)
    tl = jnp.where(mask, tl, 0.0)
    tl = jnp.maximum(tl, 0.0)
    positive = tl > 1e-16
    num_positive = jnp.sum(positive)
    num_valid = jnp.sum(mask)
    loss = jnp.sum(tl) / (num_positive + 1e-16)
    frac = num_positive / (num_valid.astype(jnp.float32) + 1e-16)
    return loss, frac


def batch_hard_triplet_loss(embeddings, labels, margin=1.0, p=2.0):
    """Hardest-positive minus hardest-negative per anchor
    (reference loss.py:60-85)."""
    dist = pairwise_distance(embeddings, p)
    b = labels.shape[0]
    eye = jnp.eye(b, dtype=bool)
    label_eq = labels[None, :] == labels[:, None]
    pos_mask = (label_eq & ~eye).astype(dist.dtype)
    hardest_pos = jnp.max(pos_mask * dist, axis=1, keepdims=True)
    neg_mask = (~label_eq).astype(dist.dtype)
    max_dist = jnp.max(dist, axis=1, keepdims=True)
    neg_dist = dist + max_dist * (1.0 - neg_mask)
    hardest_neg = jnp.min(neg_dist, axis=1, keepdims=True)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    return jnp.mean(loss), jnp.asarray(-1.0)


def triplet_margin_loss(embeddings, labels, margin=1.0, p=2.0, mining="batch_all"):
    if mining == "batch_all":
        return batch_all_triplet_loss(embeddings, labels, margin, p)
    if mining == "batch_hard":
        return batch_hard_triplet_loss(embeddings, labels, margin, p)
    raise ValueError(f"unknown mining mode {mining!r}")


# ---------------------------------------------------------------------------
# supervised contrastive (single- or multi-label positives)
# ---------------------------------------------------------------------------


def supcon_loss(embeddings, labels, temperature=0.07, eps=1e-8):
    """SupCon with self masked to -1e9 before logsumexp
    (reference loss.py:27-57). Multi-hot labels (2-D) define positives by
    label-intersection > 0."""
    emb = l2_normalize(embeddings, axis=1)
    logits = (emb @ emb.T) / temperature
    b = emb.shape[0]
    self_mask = jnp.eye(b, dtype=bool)
    if labels.ndim == 1:
        positive_mask = labels[None, :] == labels[:, None]
    else:
        inter = labels.astype(jnp.float32) @ labels.astype(jnp.float32).T
        positive_mask = inter > 0
    positive_mask = positive_mask & ~self_mask
    logits = jnp.where(self_mask, _NEG_INF, logits)
    log_prob = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    pos_per_anchor = jnp.sum(positive_mask, axis=1)
    valid = pos_per_anchor > 0
    per_anchor = -jnp.sum(positive_mask * log_prob, axis=1) / (
        pos_per_anchor.astype(jnp.float32) + eps
    )
    n_valid = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, per_anchor, 0.0)) / jnp.maximum(n_valid, 1)
    return jnp.where(n_valid > 0, loss, 0.0)


# ---------------------------------------------------------------------------
# multi-label (Jaccard) losses
# ---------------------------------------------------------------------------


def jaccard_similarity(labels: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    labels = labels.astype(jnp.float32)
    inter = labels @ labels.T
    sums = jnp.sum(labels, axis=1, keepdims=True)
    union = sums + sums.T - inter
    return inter / (union + eps)


def weighted_multilabel_triplet_loss(embeddings, labels, margin=0.3):
    """Jaccard-weighted multi-label triplet with hardest-negative mining,
    vectorized over anchors (reference loss.py:151-227 loops in Python).

    Per anchor i: positives = Jaccard>0 (excl. self), negatives = Jaccard==0;
    loss_i = mean over positives of relu(d_p - min(d_n) + margin) * w_p;
    total = mean over anchors with >=1 positive and >=1 negative.
    """
    emb = l2_normalize(embeddings, axis=1)
    dist = pairwise_distance(emb, 2.0)
    labels_f = labels.astype(jnp.float32)
    inter = labels_f @ labels_f.T
    jac = jaccard_similarity(labels_f)
    b = emb.shape[0]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = (jac > 0) & ~eye
    neg_mask = inter == 0  # exact: products of multi-hot entries sum to 0
    has_pos = jnp.any(pos_mask, axis=1)
    has_neg = jnp.any(neg_mask, axis=1)
    anchor_valid = has_pos & has_neg
    hard_neg = jnp.min(jnp.where(neg_mask, dist, jnp.inf), axis=1)
    hard_neg = jnp.where(has_neg, hard_neg, 0.0)  # dead value for invalid anchors
    per_pair = jnp.maximum(dist - hard_neg[:, None] + margin, 0.0) * jac
    pos_count = jnp.sum(pos_mask, axis=1)
    per_anchor = jnp.sum(jnp.where(pos_mask, per_pair, 0.0), axis=1) / jnp.maximum(
        pos_count, 1
    )
    count = jnp.sum(anchor_valid)
    loss = jnp.sum(jnp.where(anchor_valid, per_anchor, 0.0)) / jnp.maximum(count, 1)
    loss = jnp.where(count > 0, loss, 0.0)
    return loss, jnp.asarray(0.0)


def jaccard_supcon_loss(embeddings, labels, temperature=0.07, eps=1e-8):
    """SupCon with per-anchor Jaccard weights normalized to 1
    (reference loss.py:230-284). NIH default loss."""
    emb = l2_normalize(embeddings, axis=1)
    sim = (emb @ emb.T) / temperature
    jac = jaccard_similarity(labels, eps)
    b = emb.shape[0]
    self_mask = jnp.eye(b, dtype=bool)
    jac = jnp.where(self_mask, 0.0, jac)
    weight_sum = jnp.sum(jac, axis=1, keepdims=True) + eps
    weights = jac / weight_sum
    masked = jnp.where(self_mask, _NEG_INF, sim)
    log_prob = sim - jax.scipy.special.logsumexp(masked, axis=1, keepdims=True)
    per_anchor = -jnp.sum(weights * log_prob, axis=1)
    valid = weight_sum[:, 0] > eps
    n_valid = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, per_anchor, 0.0)) / jnp.maximum(n_valid, 1)
    return jnp.where(n_valid > 0, loss, 0.0)


def asymmetric_loss(logits, targets, gamma_pos=1.0, gamma_neg=4.0, clip=0.05, eps=1e-8):
    """Multi-label asymmetric focal BCE (reference loss.py:311-344)."""
    targets = targets.astype(jnp.float32)
    prob_pos = jax.nn.sigmoid(logits)
    prob_neg = 1.0 - prob_pos
    if clip is not None and clip > 0:
        prob_neg = jnp.minimum(prob_neg + clip, 1.0)
    log_pos = jnp.log(jnp.maximum(prob_pos, eps))
    log_neg = jnp.log(jnp.maximum(prob_neg, eps))
    loss = targets * log_pos + (1.0 - targets) * log_neg
    if gamma_pos > 0 or gamma_neg > 0:
        pt = prob_pos * targets + prob_neg * (1.0 - targets)
        gamma = gamma_pos * targets + gamma_neg * (1.0 - targets)
        loss = loss * jnp.power(1.0 - pt, gamma)
    return -jnp.mean(jnp.sum(loss, axis=1))


def multilabel_contrastive_loss(
    embeddings, labels, temperature=0.07, use_jaccard_weight=True, eps=1e-8
):
    """Jaccard-weighted SupCon with per-anchor weight normalization at loss
    time (reference loss.py:287-384)."""
    emb = l2_normalize(embeddings, axis=1)
    labels_f = labels.astype(jnp.float32)
    inter = labels_f @ labels_f.T
    jac = jaccard_similarity(labels_f, eps)
    b = emb.shape[0]
    self_mask = jnp.eye(b, dtype=bool)
    positive_mask = (inter > 0) & ~self_mask
    if use_jaccard_weight:
        weights = jac * positive_mask.astype(jnp.float32)
    else:
        weights = positive_mask.astype(jnp.float32)
    logits = (emb @ emb.T) / temperature
    logits = jnp.where(self_mask, _NEG_INF, logits)
    log_prob = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    wsum = jnp.sum(weights, axis=1)
    valid = wsum > 0
    per_anchor = -jnp.sum(weights * log_prob, axis=1) / jnp.maximum(wsum, eps)
    n_valid = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, per_anchor, 0.0)) / jnp.maximum(n_valid, 1)
    return jnp.where(n_valid > 0, loss, 0.0)


def dual_branch_multilabel_loss(
    outputs: dict,
    labels,
    alpha=1.0,
    temperature=0.07,
    use_jaccard_weight=True,
    gamma_pos=1.0,
    gamma_neg=4.0,
    clip=0.05,
):
    """contrastive(embedding) + alpha * ASL(logits) on a dual-head output dict
    (reference loss.py:387-427)."""
    contrastive = multilabel_contrastive_loss(
        outputs["embedding"], labels, temperature, use_jaccard_weight
    )
    asl = asymmetric_loss(outputs["logits"], labels, gamma_pos, gamma_neg, clip)
    total = contrastive + alpha * asl
    return total, {"contrastive": contrastive, "asl": asl}


# ---------------------------------------------------------------------------
# hashing (ATH)
# ---------------------------------------------------------------------------


def triplet_hash_loss(anchor_hash, positive_hash, negative_hash, margin=0.5):
    """MSE-based triplet on hash codes, margin scaled by code length
    (reference ath_model.py:111-123)."""
    margin_val = margin * anchor_hash.shape[1]
    pos = jnp.mean((anchor_hash - positive_hash) ** 2, axis=1)
    neg = jnp.mean((anchor_hash - negative_hash) ** 2, axis=1)
    return jnp.mean(jnp.maximum(margin_val - neg + pos, 0.0))
