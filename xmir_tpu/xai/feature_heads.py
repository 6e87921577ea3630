"""Differentiable feature->embedding head functions for gradient-based XAI.

The reference extracts intermediate activations with forward hooks and
backprops scores to them (gradcam.py:5-57, explanations.py:605-661). Here the
backbones already RETURN their final conv features; these small functions
recompute the head (pool + fc + normalize) from the param tree, so
`jax.grad(lambda feats: score(head_fn(feats)))` gives exact feature gradients
with no hook machinery.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


def _dense(params, x):
    return x @ params["kernel"] + params.get("bias", 0.0)


def _layernorm(scale, bias, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def densenet_head(params, features):
    """DenseNet121Embedder tail: ReLU -> GAP -> optional fc -> normalize
    (features are the post-norm5, pre-ReLU map)."""
    x = jnp.mean(jnp.maximum(features, 0.0), axis=(1, 2))
    if "fc" in params:
        x = _dense(params["fc"], x)
    return l2_normalize(x, axis=1)


def resnet_head(params, features):
    """ResNet50Embedder tail: GAP -> optional fc -> normalize (features are
    post-ReLU)."""
    x = jnp.mean(features, axis=(1, 2))
    if "fc" in params:
        x = _dense(params["fc"], x)
    return l2_normalize(x, axis=1)


def convnext_head(params, features):
    """ConvNeXtV2Embedder tail: GAP -> head LayerNorm -> optional fc ->
    normalize."""
    x = jnp.mean(features, axis=(1, 2))
    hn = params["backbone"]["head_norm"]
    x = _layernorm(hn["scale"], hn["bias"], x)
    if "fc" in params:
        x = _dense(params["fc"], x)
    return l2_normalize(x, axis=1)


FEATURE_HEADS = {
    "densenet121": lambda params: lambda feats: densenet_head(params, feats),
    "resnet50": lambda params: lambda feats: resnet_head(params, feats),
    "convnextv2": lambda params: lambda feats: convnext_head(params, feats),
    # TinyEmbedder tail is GAP -> fc -> normalize on post-ReLU features,
    # identical to the ResNet tail
    "tiny": lambda params: lambda feats: resnet_head(params, feats),
}


def get_feature_head(model_name: str, params):
    try:
        return FEATURE_HEADS[model_name](params)
    except KeyError:
        raise ValueError(
            f"no feature head for {model_name!r}; options: {sorted(FEATURE_HEADS)}"
        )
