"""Grad-CAM on a cosine-similarity target for ViT backbones.

TPU-native equivalent of the reference's MedSigLIP Grad-CAM wrapper
(medsiglip_saliency.py:51-131): the reference hooks the last encoder layer,
reshapes (B, N, D) patch tokens to a (B, D, g, g) feature map, and runs
pytorch-grad-cam with a cosine(query, embedding) target. Here the gradient
at the last encoder layer is taken functionally through a zero `token_delta`
tap the backbone adds to its final-layer tokens (models/siglip.py): no hooks,
fully jittable, batched over retrieved images.

CAM = relu( sum_d  mean_patches(dS/dA)_d * A_d ), bilinearly upsampled.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


@functools.partial(jax.jit, static_argnames=("apply_fn", "out_hw"))
def vit_gradcam_similarity(
    apply_fn: Callable,
    variables,
    query_embedding: jnp.ndarray,
    images: jnp.ndarray,
    out_hw: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Saliency of cosine(query, embed(image)) over ViT patch positions.

    apply_fn(variables, x, token_delta) must return a dict with
    "embedding" (B, D, L2-normalized) and "encoder_tokens" (B, N, D) — e.g.
    MedSigLIPEmbedder. Returns (B, H, W) maps, each max-normalized to [0, 1].
    """
    b, h_img, w_img = images.shape[0], images.shape[1], images.shape[2]
    out_hw = out_hw or (h_img, w_img)
    q = l2_normalize(jnp.asarray(query_embedding)[None], axis=1)[0]

    # token shape from a cheap abstract evaluation (no FLOPs)
    tok_shape = jax.eval_shape(
        lambda v, x: apply_fn(v, x, None)["encoder_tokens"], variables, images
    ).shape

    def objective(delta):
        out = apply_fn(variables, images, delta)
        sims = jnp.sum(out["embedding"] * q[None], axis=1)  # (B,)
        return jnp.sum(sims), out["encoder_tokens"]

    grads, acts = jax.grad(objective, has_aux=True)(
        jnp.zeros(tok_shape, jnp.float32)
    )
    n_tok = acts.shape[1]
    g = int(round(n_tok**0.5))
    acts = acts.reshape(b, g, g, -1)
    grads = grads.reshape(b, g, g, -1)
    weights = jnp.mean(grads, axis=(1, 2))  # (B, D): GAP of gradients
    cam = jnp.maximum(jnp.einsum("bhwd,bd->bhw", acts, weights), 0.0)
    cam = cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-8)
    return jax.image.resize(cam, (b,) + tuple(out_hw), "bilinear")


def make_vit_gradcam_fn(model):
    """Bind a model whose __call__ accepts token_delta (MedSigLIPEmbedder)
    into the apply_fn signature vit_gradcam_similarity expects."""

    def apply_fn(variables, x, delta):
        return model.apply(variables, x, train=False, token_delta=delta)

    return apply_fn
