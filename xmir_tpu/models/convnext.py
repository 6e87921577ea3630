"""ConvNeXtV2 backbone in Flax (NHWC).

Implements the fcmae ConvNeXtV2-Base graph (reference model.py:87-117 uses
timm `convnextv2_base.fcmae_ft_in22k_in1k_384`, num_classes=0): stem 4x4/4 +
LN, stages of blocks (7x7 depthwise conv -> LN -> 4x pointwise -> GELU -> GRN
-> pointwise), LN+2x2/2 downsampling between stages, and a head LayerNorm
applied after global average pooling. NHWC end to end — the depthwise 7x7 and
pointwise convs map straight onto the MXU/VPU without layout transposes.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .vit import DenseParams
from .activations import adaptive_gelu
import jax.numpy as jnp


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2's replacement for LayerScale)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x * x, axis=(1, 2), keepdims=True) + 1e-12)  # (B,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class _GRNParams(nn.Module):
    """GRN gamma/beta with the same param tree as the GRN module."""

    dim: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        return gamma, beta




class ConvNeXtV2Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            self.dim,
            (7, 7),
            padding=3,
            feature_group_count=self.dim,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)

        w1, b1 = DenseParams(4 * self.dim, name="pwconv1")(self.dim)
        w2, b2 = DenseParams(self.dim, name="pwconv2")(4 * self.dim)
        gamma, beta = _GRNParams(4 * self.dim, name="grn")()

        from ..ops.convnext_block_pallas import (
            convnext_mlp_grn_fused,
            fused_mlp_enabled,
        )

        # the fused kernel has no VJP — inference only; training keeps the
        # differentiable XLA path
        if fused_mlp_enabled(h.dtype) and not train:
            b_, hh, ww, c = x.shape
            out = convnext_mlp_grn_fused(
                h.reshape(b_, hh * ww, c),
                x.reshape(b_, hh * ww, c),
                w1.astype(h.dtype), b1, w2.astype(h.dtype), b2, gamma, beta,
            )
            return out.reshape(b_, hh, ww, c)

        h = h @ w1 + b1
        h = adaptive_gelu(h)
        h = _grn_apply(h, gamma, beta)
        h = h @ w2 + b2
        return x + h


def _grn_apply(x, gamma, beta):
    gx = jnp.sqrt(jnp.sum(x * x, axis=(1, 2), keepdims=True) + 1e-12)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return gamma * (x * nx) + beta + x


class ConvNeXtV2Backbone(nn.Module):
    """Returns {"features": (B, H/32, W/32, C) pre-pool map,
    "pooled": (B, C) GAP, "pooled_norm": (B, C) after head LayerNorm}."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for i, depth in enumerate(self.depths):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample{i}_norm")(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), name=f"downsample{i}_conv"
                )(x)
            for j in range(depth):
                x = ConvNeXtV2Block(self.dims[i], name=f"stage{i}_block{j}")(
                    x, train
                )
        features = x
        pooled = jnp.mean(x, axis=(1, 2))
        ln = nn.LayerNorm(epsilon=1e-6, name="head_norm")
        pooled_norm = ln(pooled)
        # expose the head LayerNorm params: the SRA/PCAM heads reuse
        # `head.norm` in the reference (model.py:183-190, 262-268)
        norm_params = (
            ln.variables["params"]["scale"],
            ln.variables["params"]["bias"],
        )
        return {
            "features": features,
            "pooled": pooled,
            "pooled_norm": pooled_norm,
            "head_norm": norm_params,
        }


def convnextv2_base() -> ConvNeXtV2Backbone:
    return ConvNeXtV2Backbone(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))


def convnextv2_tiny() -> ConvNeXtV2Backbone:
    return ConvNeXtV2Backbone(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
