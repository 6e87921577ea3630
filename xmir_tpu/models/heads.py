"""Retrieval heads: SRA, PCAM pooling, projection heads, distillation helpers.

Parity targets:
  SRA               reference model.py:120-163
  PCAMPool          reference model.py:199-247
  MedSigLIP proj    reference model.py:588-594 (Linear 512 -> LN -> ReLU -> Linear)
  NIH projection    reference nih_multilabel_retrieval.py:185-190 (512 -> GELU -> 256)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


def _channel_layernorm(v, scale, bias, eps=1e-6):
    mean = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.var(v, axis=-1, keepdims=True)
    return (v - mean) / jnp.sqrt(var + eps) * scale + bias


class SRA(nn.Module):
    """Spatial Residual Attention: K 1x1-conv attention heads, softmax over
    H*W, residual fusion gap + lam * attention features (model.py:120-163).

    Operates NHWC. ``share_norm`` applies the backbone head LayerNorm params
    (passed as (scale, bias)) to both branches, matching the reference's reuse
    of `convnext.head.norm`.
    """

    input_dim: int
    num_heads: int = 8
    lam: float = 0.1

    @nn.compact
    def __call__(self, x, norm_params: Optional[tuple] = None):
        b, h, w, c = x.shape
        gap = jnp.mean(x, axis=(1, 2))  # (B, C)
        att_map = nn.Conv(
            self.num_heads,
            (1, 1),
            use_bias=False,
            kernel_init=nn.initializers.normal(1e-4),
            name="conv_att",
        )(x)  # (B, H, W, K)
        att = att_map.reshape(b, h * w, self.num_heads)
        att = nn.softmax(att, axis=1)  # softmax over spatial positions
        x_flat = x.reshape(b, h * w, c)
        # (B, K, H*W) @ (B, H*W, C) -> (B, K, C), then head-mean
        csra = jnp.einsum("bsk,bsc->bkc", att, x_flat).mean(axis=1)
        if norm_params is not None:
            scale, bias = norm_params
            gap = _channel_layernorm(gap, scale, bias)
            csra = _channel_layernorm(csra, scale, bias)
        return gap + self.lam * csra


class PCAMPool(nn.Module):
    """Probabilistic-CAM pooling (model.py:199-247). NHWC.

    Returns (embedding, class_logits, pcam_probs(B, H, W, K))."""

    input_dim: int
    num_classes: int
    lam: float = 0.1
    embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, norm_params: Optional[tuple] = None):
        b, h, w, c = x.shape
        gap = jnp.mean(x, axis=(1, 2))
        if norm_params is not None:
            scale, bias = norm_params
            gap = _channel_layernorm(gap, scale, bias)
            x_n = _channel_layernorm(x, scale, bias)
        else:
            x_n = x
        # 1x1 conv classifier as explicit params — its weight matrix is reused
        # below for the class-pooled logits (reference model.py:232-238)
        w_mat = self.param(
            "classifier_kernel", nn.initializers.lecun_normal(), (c, self.num_classes)
        )
        b_vec = self.param("classifier_bias", nn.initializers.zeros, (self.num_classes,))
        cam_logits = jnp.einsum("bhwc,ck->bhwk", x_n, w_mat) + b_vec
        pcam_probs = nn.sigmoid(cam_logits)
        wgt = pcam_probs.reshape(b, h * w, self.num_classes)
        wgt = wgt / (jnp.sum(wgt, axis=1, keepdims=True) + 1e-8)
        x_flat = x_n.reshape(b, h * w, c)
        class_pooled = jnp.einsum("bsk,bsc->bkc", wgt, x_flat)  # (B, K, C)
        class_logits = jnp.einsum("bkc,ck->bk", class_pooled, w_mat) + b_vec
        class_weights = nn.softmax(class_logits, axis=1)[:, :, None]
        pcam_feat = jnp.sum(class_weights * class_pooled, axis=1)
        feat = gap + self.lam * pcam_feat
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        return l2_normalize(feat, axis=1), class_logits, pcam_probs


class MedSigLIPProjection(nn.Module):
    """Linear(hidden->512) -> LayerNorm -> ReLU -> Linear(512->embed_dim)."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(512, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_dim, name="fc2")(x)


class NIHProjectionHead(nn.Module):
    """Linear(backbone->512) -> GELU -> Linear(512->256) + 14-logit classifier."""

    num_labels: int = 14
    proj_dim: int = 256

    @nn.compact
    def __call__(self, feats):
        p = nn.Dense(512, name="proj_fc1")(feats)
        p = nn.gelu(p, approximate=False)
        projection = nn.Dense(self.proj_dim, name="proj_fc2")(p)
        logits = nn.Dense(self.num_labels, name="classifier")(projection)
        return projection, logits
