"""Zero-shot classification + text-aware retrieval variants
(reference test.py:237-849).

  - zero-shot classification from class-prompt text embeddings
    (test.py:237-347 BiomedCLIP path, test_conceptclip.py)
  - concept-profile retrieval: sigmoid(logit_scale * img @ concept^T) score
    vectors used AS the retrieval embedding (test.py:350-509)
  - two-model text reranking: backbone retrieval, then top-k rescored by
    alpha * img_sim + (1 - alpha) * text_score where text_score is the
    retrieved image's similarity to the QUERY's class prompt
    (test.py:512-674)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.metric_losses import l2_normalize


def zero_shot_classify(image_feats, class_text_feats, logit_scale=1.0, logit_bias=0.0):
    """Predicted class per image + probability matrix.

    image_feats (N, D), class_text_feats (C, D); both normalized here.
    Returns (preds (N,), probs (N, C) sigmoid scores)."""
    img = l2_normalize(jnp.asarray(image_feats), axis=-1)
    txt = l2_normalize(jnp.asarray(class_text_feats), axis=-1)
    logits = jnp.exp(jnp.asarray(logit_scale)) * (img @ txt.T) + logit_bias
    probs = jax.nn.sigmoid(logits)
    return np.asarray(jnp.argmax(logits, axis=1)), np.asarray(probs)


def concept_profile_embeddings(
    image_feats, concept_feats, logit_scale=1.0, logit_bias=0.0
):
    """Represent each image by its concept-confidence vector
    sigmoid(t * cos(img, concept) + b) — retrieval then runs on these
    profiles (reference test.py:350-509)."""
    img = l2_normalize(jnp.asarray(image_feats), axis=-1)
    con = l2_normalize(jnp.asarray(concept_feats), axis=-1)
    scores = jax.nn.sigmoid(
        jnp.exp(jnp.asarray(logit_scale)) * (img @ con.T) + logit_bias
    )
    return np.asarray(scores)


def text_rerank_scores(
    image_embeds: np.ndarray,
    labels: np.ndarray,
    image_text_sim: np.ndarray,
    rerank_k: int = 20,
    image_weight: float = 0.7,
) -> np.ndarray:
    """Two-model reranking (reference test.py:603-622): start from the image
    cosine matrix (diag -inf); per query i rescore its top-k entries j as
    image_weight * img_sim[i, j] + (1 - image_weight) * image_text_sim[j, label_i].

    image_text_sim: (N, C) similarity of each image to each class prompt.
    Returns the reranked (N, N) score matrix.
    """
    e = np.asarray(image_embeds, np.float64)
    e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    img_sim = e @ e.T
    np.fill_diagonal(img_sim, -np.inf)
    labels = np.asarray(labels).astype(int)
    its = np.asarray(image_text_sim, np.float64)
    n = len(labels)
    out = img_sim.copy()
    alpha, beta = image_weight, 1.0 - image_weight
    k = min(rerank_k, n)
    for i in range(n):
        top = np.argpartition(-img_sim[i], k - 1)[:k]
        out[i, top] = alpha * img_sim[i, top] + beta * its[top, labels[i]]
    return out


def build_class_prompts(label_names: Sequence[str], template: str = "a medical image showing {}"):
    return [template.format(name) for name in label_names]
