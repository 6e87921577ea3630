"""Additional saliency variants (reference explanations.py:155-602):

  SBSMMask       masked / gaussian-blurred QUERY before the standard SBSM
                 occlusion loop (explanations.py:155-253)
  SBSMFeature    feature-space occlusion: masks applied to the query's last
                 conv map instead of pixels (explanations.py:255-387)
  FSal           classifier-probe saliency: sklearn probe on pos/neg
                 embeddings; saliency = coverage-weighted probability drop
                 (explanations.py:390-466)
  FSalGrad       Grad-CAM of a logistic-regression probe loaded as a linear
                 head (explanations.py:469-537)
  SimScoreCAM    Score-CAM adapted to similarity: channel activation maps as
                 masks, scored by distance increase (explanations.py:540-602;
                 the reference's `torch.matmul` mask application is replaced
                 by the intended Score-CAM elementwise masking)
"""
from __future__ import annotations

import math
from typing import Callable, Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .sbsm import _cdist, _masked_embeds

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _gauss_kernel_1d(sigma: float) -> np.ndarray:
    width = math.ceil(4 * sigma)
    xs = np.arange(-width, width + 1, dtype=np.float32)
    k = np.exp(-((xs / sigma) ** 2) / 2) / (sigma * math.sqrt(2 * math.pi))
    return k


def gaussian_blur_normed(x: jnp.ndarray, sigma: float = 8.0) -> jnp.ndarray:
    """Blur a NORMALIZED image batch in pixel space: denormalize (ImageNet
    stats), separable gaussian blur (kernel width ceil(4*sigma)), renormalize
    (reference SBSMMask.create_kernel/blur/norm/denorm)."""
    k1 = _gauss_kernel_1d(sigma)
    k1 = k1 / k1.sum() ** 0.5  # split normalization across the two passes
    kh = jnp.asarray(k1)[:, None, None, None] * jnp.ones((1, 1, 1, 1))
    pix = x * IMAGENET_STD + IMAGENET_MEAN
    c = x.shape[-1]
    kernel_h = jnp.zeros((len(k1), 1, 1, c)).at[:, 0, 0, :].set(
        jnp.asarray(k1)[:, None]
    )
    kernel_w = jnp.zeros((1, len(k1), 1, c)).at[0, :, 0, :].set(
        jnp.asarray(k1)[:, None]
    )
    dn = ("NHWC", "HWIO", "NHWC")
    pix = jax.lax.conv_general_dilated(
        pix, kernel_h, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    pix = jax.lax.conv_general_dilated(
        pix, kernel_w, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return (pix - IMAGENET_MEAN) / IMAGENET_STD


def transform_query(x_q, region_mask, mode: Literal["mask", "blur"] = "mask",
                    sigma: float = 8.0):
    """Apply a user-supplied region mask to the query (1 keeps, 0 hides):
    'mask' zeroes hidden pixels, 'blur' replaces them with the blurred image
    (reference SBSMMask.transform)."""
    m = region_mask[..., None] if region_mask.ndim == 3 else region_mask
    if mode == "mask":
        return m * x_q
    if mode == "blur":
        return m * x_q + (1.0 - m) * gaussian_blur_normed(x_q, sigma)
    raise ValueError(f"unsupported mode {mode!r}")


def sbsm_masked_query_saliency(
    embed_fn, variables, x_q, x, masks, region_mask,
    mode: Literal["mask", "blur"] = "mask", sigma: float = 8.0, chunk: int = 128,
):
    """SBSMMask: focus the explanation on a query region by masking/blurring
    the rest of the query, then run the standard SBSM occlusion on the
    retrieved image. x_q (1, H, W, C), x (1, H, W, C) -> (H, W)."""
    xq_t = transform_query(x_q, region_mask, mode, sigma)
    q = embed_fn(variables, xq_t)
    r = embed_fn(variables, x)
    o_dist = _cdist(q, r)[0, 0]
    masks = masks.astype(jnp.float32)
    me = _masked_embeds(embed_fn, variables, x[0], masks, chunk)
    m_dist = jnp.linalg.norm(q[0][None] - me, axis=1)
    excess = jnp.maximum(m_dist - o_dist, 0.0)
    count = masks.shape[0] - jnp.sum(masks, axis=0)
    k = (1.0 - masks) * excess[:, None, None]
    return jnp.sum(k, axis=0) / jnp.maximum(count, 1.0)


def sbsm_feature_saliency(
    embed_fn, variables, features_fn, x_q, x, masks, chunk: int = 128
):
    """SBSMFeature-style: the query is represented by spatially-masked
    averages of its (upsampled) last conv features; occlusion runs on the
    retrieved image as usual (explanations.py:255-298). Returns (h, w) map at
    input resolution."""
    h, w = x_q.shape[1], x_q.shape[2]
    feats = features_fn(x_q)  # (1, fh, fw, C)
    feats_up = jax.image.resize(
        feats, (1, h, w, feats.shape[-1]), "bilinear"
    )[0]
    masks = masks.astype(jnp.float32)
    # masked average feature per mask -> query embeddings in feature space
    msum = jnp.einsum("nhw,hwc->nc", masks, feats_up)
    q_feats = msum / jnp.maximum(
        jnp.sum(masks, axis=(1, 2))[:, None], 1.0
    )  # (N, C)
    # retrieved embedding must live in the same feature space: use the
    # unmasked averaged features of x
    r_feats = jnp.mean(features_fn(x), axis=(1, 2))  # (1, C)
    full_q = jnp.mean(feats, axis=(1, 2))  # (1, C)
    o_dist = _cdist(full_q, r_feats)[0, 0]
    m_dist = _cdist(q_feats, r_feats)[:, 0]
    excess = jnp.maximum(m_dist - o_dist, 0.0)
    count = masks.shape[0] - jnp.sum(masks, axis=0)
    k = (1.0 - masks) * excess[:, None, None]
    return jnp.sum(k, axis=0) / jnp.maximum(count, 1.0)


class ProbeClassifier:
    """sklearn probe on embeddings (reference FSal.build_classifier)."""

    def __init__(self, mode: str = "logistic_reg"):
        if mode == "knn":
            from sklearn.neighbors import KNeighborsClassifier

            self.clf = KNeighborsClassifier(
                n_neighbors=4, weights="distance", algorithm="auto", leaf_size=50
            )
        elif mode == "svm":
            from sklearn import svm

            self.clf = svm.NuSVC(probability=True)
        elif mode == "logistic_reg":
            from sklearn.linear_model import LogisticRegression

            self.clf = LogisticRegression(random_state=0)
        else:
            raise ValueError(f"invalid classifier {mode!r}")
        self.mode = mode

    def fit(self, pos_features, neg_features):
        x = np.concatenate([np.asarray(neg_features), np.asarray(pos_features)])
        y = np.concatenate(
            [np.zeros(len(neg_features)), np.ones(len(pos_features))]
        )
        self.clf.fit(x, y)
        return self

    def prob_pos(self, feats) -> np.ndarray:
        return self.clf.predict_proba(np.asarray(feats))[:, 1]


def fsal_saliency(embed_fn, variables, x, masks, probe: ProbeClassifier,
                  chunk: int = 128):
    """FSal: probability drop of the positive class when regions are occluded
    (explanations.py:416-435). x (B, H, W, C) -> (B, H, W)."""
    masks_j = jnp.asarray(masks, jnp.float32)
    emb = embed_fn(variables, x)
    pr_o = probe.prob_pos(np.asarray(emb))  # (B,)
    count = np.asarray(masks_j.shape[0] - jnp.sum(masks_j, axis=0))
    sals = []
    for b in range(x.shape[0]):
        me = np.asarray(_masked_embeds(embed_fn, variables, x[b], masks_j, chunk))
        pr_x = probe.prob_pos(me)  # (N,)
        diff = np.clip(pr_o[b] - pr_x, 0.0, None)
        k = (1.0 - np.asarray(masks_j)) * diff[:, None, None]
        sals.append(k.sum(0) / np.maximum(count, 1.0))
    return np.stack(sals)


def fsal_grad_saliency(features_fn, head_fn, probe: ProbeClassifier, x):
    """FSalGrad: load logistic-regression weights as a linear head on the
    embedding and Grad-CAM its logit (explanations.py:469-537).
    x (B, H, W, C) -> (B, H, W)."""
    coef = jnp.asarray(probe.clf.coef_[0])
    intercept = jnp.asarray(probe.clf.intercept_[0])
    h_img, w_img = x.shape[1], x.shape[2]
    feats = features_fn(x)

    def score_sum(f):
        emb = head_fn(f)
        return jnp.sum(emb @ coef + intercept)

    grads = jax.grad(score_sum)(feats)
    weights = jnp.mean(grads, axis=(1, 2))
    m = jnp.maximum(jnp.einsum("bhwc,bc->bhw", feats, weights), 0.0)
    return jax.image.resize(m, (m.shape[0], h_img, w_img), "bilinear")


def sim_score_cam(embed_fn, variables, features_fn, x_q, x, chunk: int = 64):
    """SimScoreCAM: each channel's (inverted, normalized) activation map
    masks the retrieved image; masked variants are scored by the distance
    increase to the query; saliency = score-weighted mean of activations
    (explanations.py:540-602). x_q (1, H, W, C), x (1, H, W, C) -> (H, W)."""
    h, w = x_q.shape[1], x_q.shape[2]
    q = embed_fn(variables, x_q)
    r = embed_fn(variables, x)
    o_dist = _cdist(q, r)[0, 0]
    acts = features_fn(x)  # (1, fh, fw, C)
    acts_up = jax.image.resize(acts, (1, h, w, acts.shape[-1]), "bilinear")[0]
    amin = jnp.min(acts_up.reshape(-1, acts_up.shape[-1]), axis=0)
    amax = jnp.max(acts_up.reshape(-1, acts_up.shape[-1]), axis=0)
    valid = amax > amin
    denom = jnp.where(valid, amax - amin, 1.0)
    norm_inv = 1.0 - (acts_up - amin) / denom  # (H, W, C)
    norm_inv = jnp.where(valid[None, None, :], norm_inv, 0.0)

    c = acts_up.shape[-1]
    pad = (-c) % chunk
    maps = jnp.moveaxis(norm_inv, -1, 0)  # (C, H, W)
    maps_p = jnp.concatenate([maps, jnp.zeros((pad, h, w))]) if pad else maps
    chunks = maps_p.reshape(-1, chunk, h, w)

    def one_chunk(mc):
        masked = mc[..., None] * x[0][None]
        return embed_fn(variables, masked)

    me = jax.lax.map(one_chunk, chunks).reshape(-1, q.shape[-1])[:c]
    m_dist = _cdist(q, me)[0]  # (C,)
    score = jnp.maximum(m_dist - o_dist, 0.0)
    rng = jnp.max(score) - jnp.min(score)
    score = jnp.where(rng > 0, (score - jnp.min(score)) / rng, score)
    score = jnp.where(valid, score, 0.0)
    return jnp.mean(score[None, None, :] * acts_up, axis=-1)
