"""Attention rollout saliency (Abnar & Zuidema) with head fusion,
row-sparsification, and optional query-guided reweighting — reference
explanations.py:979-1147 (AttentionRolloutMedSigLIP).

Models in this framework RETURN attention weights (output_attentions=True),
so no eager-attention surgery is needed (the reference's
_convert_sdpa_to_eager_attention, model.py:496-533, is obsolete by design).
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


def _fuse_heads(attn: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "mean":
        return jnp.mean(attn, axis=1)
    if mode == "max":
        return jnp.max(attn, axis=1)
    if mode == "min":
        return jnp.min(attn, axis=1)
    raise ValueError(f"Unknown head_fusion mode: {mode!r}")


@functools.partial(jax.jit, static_argnames=("head_fusion", "discard_ratio"))
def attention_rollout(
    attentions: Sequence[jnp.ndarray],
    head_fusion: str = "mean",
    discard_ratio: float = 0.9,
):
    """attentions: per-layer (B, heads, N, N) -> cumulative rollout (B, N, N).

    Per layer: fuse heads, zero the lowest `discard_ratio` fraction of each
    row (threshold = k-th smallest, matching torch.kthvalue semantics), add
    the identity residual, row-normalize, chain-multiply.
    """
    b, _, n, _ = attentions[0].shape
    eye = jnp.eye(n)
    result = jnp.broadcast_to(eye, (b, n, n))
    for attn in attentions:
        a = _fuse_heads(attn.astype(jnp.float32), head_fusion)
        if discard_ratio > 0.0:
            k = max(1, int(n * discard_ratio))
            thresh = jnp.sort(a, axis=-1)[..., k - 1]  # k-th smallest per row
            a = a * (a > thresh[..., None])
        a = a + eye[None]
        a = a / (jnp.sum(a, axis=-1, keepdims=True) + 1e-8)
        result = jnp.einsum("bij,bjk->bik", a, result)
    return result


def rollout_saliency(
    attentions: Sequence[jnp.ndarray],
    out_hw,
    head_fusion: str = "mean",
    discard_ratio: float = 0.9,
    query_embedding=None,
    patch_embeddings=None,
):
    """Spatial saliency from rollout. Mean-pooled token importance (SigLIP has
    no CLS), optionally reweighted by clipped cosine(query, patch) when
    `query_embedding` (D,) and `patch_embeddings` (B, N, D) — already
    projected to the query's space — are given.
    Returns (B, H, W)."""
    rollout = attention_rollout(attentions, head_fusion, discard_ratio)
    importance = jnp.mean(rollout, axis=1)  # (B, N)
    if query_embedding is not None and patch_embeddings is not None:
        patches = l2_normalize(patch_embeddings, axis=-1)
        q = l2_normalize(query_embedding.reshape(1, 1, -1), axis=-1)
        sim = jnp.maximum(jnp.sum(patches * q, axis=-1), 0.0)  # (B, N)
        importance = importance * sim
    n_patches = importance.shape[1]
    side = int(round(n_patches**0.5))
    if side * side != n_patches:
        raise ValueError(
            f"Number of patches ({n_patches}) is not a perfect square."
        )
    sal = importance.reshape(-1, side, side)
    return jax.image.resize(sal, (sal.shape[0], out_hw[0], out_hw[1]), "bilinear")
