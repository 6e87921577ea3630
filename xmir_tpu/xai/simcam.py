"""SimCAM: pairwise similarity decomposition saliency (reference
explanations.py:753-900, vectorized form of the O(h^2 w^2) 4-loop original
at 664-750).

D[n, i, j] = <q_token_i, r_token_j> over final conv feature tokens;
query map = sum_j D, retrieval map = sum_i D, both ReLU'd after per-pair
max-normalization, bilinearly upsampled. Point-specific retrieval maps
bilinearly interpolate D at a query pixel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("out_hw",))
def simcam_maps(q_feats: jnp.ndarray, r_feats: jnp.ndarray, out_hw=(224, 224)):
    """q_feats: (h, w, C) query features; r_feats: (N, h, w, C) retrieved.
    Returns (N, 2, H, W): [query map, retrieval map] per pair."""
    h, w, c = q_feats.shape
    n = r_feats.shape[0]
    q = q_feats.reshape(h * w, c)
    r = r_feats.reshape(n, h * w, c)
    d = jnp.einsum("qc,nrc->nqr", q, r)  # (N, hw, hw)
    d = d / (jnp.max(d, axis=(1, 2), keepdims=True) + 1e-8)
    d = jnp.maximum(d, 0.0)
    d = d.reshape(n, h, w, h, w)
    decom_q = jnp.sum(d, axis=(3, 4))  # (N, h, w)
    decom_r = jnp.sum(d, axis=(1, 2))  # (N, h, w)
    maps = jnp.stack([decom_q, decom_r], axis=1)  # (N, 2, h, w)
    return jax.image.resize(maps, (n, 2, out_hw[0], out_hw[1]), "bilinear")


def point_specific_map(decom: jnp.ndarray, point, size=(224, 224)):
    """Retrieval map for a specific query pixel (reference
    explanations.py:768-798): replicate-pad the (h, w, h, w) decomposition and
    bilinearly interpolate at the transformed query coordinate."""
    h = decom.shape[0]
    padded = jnp.pad(decom, ((1, 1), (1, 1), (0, 0), (0, 0)), mode="edge")
    x = (point[0] + 0.5) / size[0] * h + 0.5
    y = (point[1] + 0.5) / size[1] * h + 0.5
    x_min, y_min = int(np.floor(x)), int(np.floor(y))
    dx, dy = x - x_min, y - y_min
    interp = (
        padded[x_min, y_min] * (1 - dx) * (1 - dy)
        + padded[x_min + 1, y_min] * dx * (1 - dy)
        + padded[x_min, y_min + 1] * (1 - dx) * dy
        + padded[x_min + 1, y_min + 1] * dx * dy
    )
    return jnp.maximum(interp, 0.0)


def simcam_decomposition(q_feats: jnp.ndarray, r_feats_one: jnp.ndarray):
    """Full (h, w, h, w) decomposition for one pair (for point-specific use)."""
    h, w, c = q_feats.shape
    d = jnp.einsum("qc,rc->qr", q_feats.reshape(-1, c), r_feats_one.reshape(-1, c))
    d = d / (jnp.max(d) + 1e-8)
    return jnp.maximum(d, 0.0).reshape(h, w, h, w)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def simcam_vit_maps(q_tokens: jnp.ndarray, r_tokens: jnp.ndarray, out_hw=(448, 448)):
    """ViT-token SimCAM (reference SimCAM_MedSigLIP, explanations.py:903-976):
    same decomposition over patch tokens (no CLS). q_tokens (n, D),
    r_tokens (N, n, D) with n a perfect square."""
    n_tok = q_tokens.shape[0]
    side = int(round(n_tok**0.5))
    if side * side != n_tok:
        raise ValueError(f"patch count {n_tok} is not a perfect square")
    d = jnp.einsum("qc,nrc->nqr", q_tokens, r_tokens)
    d = d / (jnp.max(d, axis=(1, 2), keepdims=True) + 1e-8)
    d = jnp.maximum(d, 0.0)
    d = d.reshape(-1, side, side, side, side)
    maps = jnp.stack(
        [jnp.sum(d, axis=(3, 4)), jnp.sum(d, axis=(1, 2))], axis=1
    )
    return jax.image.resize(
        maps, (maps.shape[0], 2, out_hw[0], out_hw[1]), "bilinear"
    )
