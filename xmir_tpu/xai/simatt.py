"""SimAtt: similarity-attention triplet saliency (reference
explanations.py:605-661).

Given anchor (+optional positive/negative images), build the weight vector
w = prod_i |e_0 - e_i| (positive term inverted), score each sample
s_b = |e_b| . w, and Grad-CAM the scores against the last conv features:
M_b = relu(mean_spatial(d s / d A_b) . A_b), upsampled to input size.

Gradients flow through a functional feature->embedding head
(xai/feature_heads.py) instead of forward hooks + autograd.grad.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


def _upsample(maps, h, w):
    return jax.image.resize(maps, (maps.shape[0], h, w), "bilinear")


@functools.partial(jax.jit, static_argnames=("features_fn", "head_fn", "n_pos"))
def simatt_saliency(
    features_fn: Callable,
    head_fn: Callable,
    x_stack: jnp.ndarray,
    n_pos: int = 1,
):
    """x_stack: (1 + P + Nn, H, W, C) stacked [anchor, positives..., negatives...].
    n_pos = number of positives directly after the anchor.
    Returns (B, H, W) saliency maps for every input in the stack.

    features_fn(x) -> (B, h, w, C) last conv features (e.g. a partial of
    model.apply returning out["features"]); head_fn(features) -> embeddings.
    """
    h_img, w_img = x_stack.shape[1], x_stack.shape[2]
    feats = features_fn(x_stack)  # (B, h, w, C)

    def score_sum(f):
        emb = head_fn(f)  # (B, D)
        e_norm = jax.lax.stop_gradient(l2_normalize(emb, axis=1))
        w = jnp.abs(e_norm[0] - e_norm[1:])  # (B-1, D)
        if n_pos > 0:
            w = w.at[:n_pos].set(1.0 - w[:n_pos])
        w = jnp.prod(w, axis=0)  # (D,)
        s = jnp.abs(emb) @ w  # (B,)
        return jnp.sum(s)

    grads = jax.grad(score_sum)(feats)  # (B, h, w, C)
    weights = jnp.mean(grads, axis=(1, 2))  # (B, C)
    m = jnp.einsum("bhwc,bc->bhw", feats, weights)
    m = jnp.maximum(m, 0.0)
    return _upsample(m, h_img, w_img)
