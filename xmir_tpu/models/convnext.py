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
import jax
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




class _ConvDWParams(nn.Module):
    """Raw 7x7 depthwise conv params with nn.Conv's tree/shapes/init —
    the fused block kernel consumes the arrays directly."""

    dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, self.dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return kernel, bias


class _LNParams(nn.Module):
    """Raw LayerNorm scale/bias with nn.LayerNorm's param tree."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class ConvNeXtV2Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        dw_kernel, dw_bias = _ConvDWParams(self.dim, name="dwconv")()
        ln_scale, ln_bias = _LNParams(self.dim, name="norm")()
        w1, b1 = DenseParams(4 * self.dim, name="pwconv1")(self.dim)
        w2, b2 = DenseParams(self.dim, name="pwconv2")(4 * self.dim)
        gamma, beta = _GRNParams(4 * self.dim, name="grn")()

        from ..ops.convnext_block_pallas import (
            convnext_block_fused,
            fused_mlp_enabled,
            fused_train_wins,
        )

        # round 3: the fused block is differentiable (custom_vjp whose
        # backward recomputes the LN/MLP/GRN tail in a per-image Pallas
        # kernel). Inference always fuses; training fuses only at shapes
        # where the Pallas backward measured FASTER than XLA's
        # saved-intermediate backward (see fused_train_wins) — elsewhere the
        # plain XLA block remains the best train path.
        r = x.shape[1] * x.shape[2]
        if fused_mlp_enabled(x.dtype) and (
            not train or fused_train_wins(r, self.dim, 4 * self.dim)
        ):
            return convnext_block_fused(
                x, dw_kernel.reshape(7, 7, self.dim), dw_bias,
                ln_scale, ln_bias,
                w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, gamma, beta,
            )

        # XLA path: exact nn.Conv/nn.LayerNorm math on the raw params
        dt = jnp.promote_types(x.dtype, dw_kernel.dtype)
        h = jax.lax.conv_general_dilated(
            x.astype(dt), dw_kernel.astype(dt),
            window_strides=(1, 1), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim,
        ) + dw_bias.astype(dt)
        # flax LayerNorm (fast variance, f32 statistics)
        hs = h.astype(jnp.promote_types(jnp.float32, h.dtype))
        mean = jnp.mean(hs, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(hs * hs, axis=-1, keepdims=True) - mean * mean, 0.0
        )
        h = (hs - mean) * jax.lax.rsqrt(var + 1e-6)
        h = (h * ln_scale + ln_bias).astype(dt)

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
