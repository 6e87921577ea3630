"""ConceptCLIP alignment losses: IT-Align + RC-Align.

Behavioral parity with reference loss.py:435-639, but RC-Align is fully
vectorized: the reference loops per-sample over variable-length concept lists
(loss.py:554-572); here concepts arrive as a padded (B, W, D) tensor with a
(B, W) validity mask so the whole loss is one einsum chain under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .metric_losses import l2_normalize

LOG_SCALE_MAX = 4.6052  # ln(100), CLIP convention (reference loss.py:467)


def it_align_loss(image_features, text_features, logit_scale, logit_bias=None):
    """SigLIP-style sigmoid contrastive loss (reference loss.py:435-493)."""
    img = l2_normalize(image_features, axis=-1)
    txt = l2_normalize(text_features, axis=-1)
    b = img.shape[0]
    t = jnp.exp(jnp.clip(logit_scale, 0.0, LOG_SCALE_MAX))
    logits = t * (img @ txt.T)
    if logit_bias is not None:
        logits = logits + logit_bias
    logits = jnp.clip(logits, -50.0, 50.0)
    z = 2.0 * jnp.eye(b) - 1.0
    loss = -jnp.mean(jax.nn.log_sigmoid(z * logits))
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def rc_align_loss(
    image_token_features,
    concept_text_features,
    concept_mask,
    logit_scale,
    logit_bias=None,
):
    """Region-concept alignment, padded-batch form (reference loss.py:496-594).

    Args:
      image_token_features: (B, N, D) patch embeddings.
      concept_text_features: (B, W, D) padded per-sample concept embeddings.
      concept_mask: (B, W) bool/0-1, True where a concept slot is real.
      logit_scale, logit_bias: learnable scalars (log-space scale).

    S(I_m, T_n) = mean over n's valid concepts of max over m's patches of
    cos(patch, concept). Samples with zero concepts are excluded from both
    rows and columns; the loss averages log-sigmoid(z * t * S) over the valid
    (V, V) block with z = +1 on the diagonal, -1 off it.
    """
    patches = l2_normalize(image_token_features, axis=-1)  # (B, N, D)
    concepts = l2_normalize(concept_text_features, axis=-1)  # (B, W, D)
    cmask = concept_mask.astype(jnp.float32)  # (B, W)
    valid_sample = jnp.sum(cmask, axis=1) > 0  # (B,)

    # A[m, n, i, j] = cos(patch_i of image m, concept_j of sample n)
    a = jnp.einsum("mid,nwd->mniw", patches, concepts)
    # max over patches i, but only meaningful where concept j is valid
    max_per_concept = jnp.max(a, axis=2)  # (B, B, W)
    w_count = jnp.maximum(jnp.sum(cmask, axis=1), 1.0)  # (B,)
    s = jnp.sum(max_per_concept * cmask[None, :, :], axis=2) / w_count[None, :]

    t = jnp.exp(jnp.clip(logit_scale, 0.0, LOG_SCALE_MAX))
    logits = t * s
    if logit_bias is not None:
        logits = logits + logit_bias
    logits = jnp.clip(logits, -50.0, 50.0)

    b = patches.shape[0]
    z = 2.0 * jnp.eye(b) - 1.0
    pair_valid = (valid_sample[:, None] & valid_sample[None, :]).astype(jnp.float32)
    n_pairs = jnp.sum(pair_valid)
    loss = -jnp.sum(jax.nn.log_sigmoid(z * logits) * pair_valid) / jnp.maximum(
        n_pairs, 1.0
    )
    loss = jnp.where(n_pairs > 0, loss, 0.0)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def conceptclip_loss(
    image_features,
    text_features,
    image_token_features,
    concept_text_features,
    concept_mask,
    logit_scale,
    logit_bias=None,
    alpha=0.5,
):
    """IT-Align + alpha * RC-Align (reference loss.py:597-639)."""
    it = it_align_loss(image_features, text_features, logit_scale, logit_bias)
    rc = rc_align_loss(
        image_token_features, concept_text_features, concept_mask, logit_scale, logit_bias
    )
    return it + alpha * rc, it, rc
