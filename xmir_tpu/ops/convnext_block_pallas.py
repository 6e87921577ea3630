"""Pallas TPU kernel: fused ConvNeXtV2 MLP + GRN + residual.

The block tail `pw1 -> GELU -> GRN -> pw2 -> +residual` expands activations
4x (e.g. (16, 96, 96, 512) bf16 = 75MB at stage 1) and XLA streams that
tensor through HBM several times (matmul out, gelu, GRN stats pass, GRN
apply, matmul in). GRN's global spatial statistics block any XLA fusion
across the expansion. Per-image the whole expanded tensor fits VMEM, so this
kernel runs the entire tail on-chip: one read of the LN'd input and the
residual, one write of the block output.

GELU uses the tanh form (error ~1e-3, below bf16's 2^-8 rounding step) —
the kernel is only enabled for bf16 compute; float32 runs keep the exact
XLA path for converted-checkpoint parity.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref):
    y = y_ref[0]  # (R, C) LayerNorm'd dwconv output for one image
    h32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h32 = jax.nn.gelu(h32, approximate=True)
    h = h32.astype(y.dtype)  # (R, 4C) expanded tensor lives only in VMEM
    # GRN (models/convnext.py GRN): global L2 over spatial per channel,
    # divided by its channel mean
    gx = jnp.sqrt(
        jnp.sum(h.astype(jnp.float32) ** 2, axis=0, keepdims=True) + 1e-12
    )  # (1, 4C)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    hh = g_ref[:] * (h.astype(jnp.float32) * nx) + be_ref[:] + h.astype(jnp.float32)
    out = jnp.dot(
        hh.astype(y.dtype), w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def convnext_mlp_grn_fused(y, x, w1, b1, w2, b2, gamma, beta,
                           interpret: bool = False):
    """y: (B, R, C) post-LN activations; x: (B, R, C) residual input;
    w1 (C, 4C), w2 (4C, C), b1/gamma/beta (4C,), b2 (C,).
    Returns (B, R, C) block output in x.dtype."""
    b, r, c = y.shape
    c4 = w1.shape[1]

    def img_spec():
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            img_spec(), img_spec(),
            const_spec((c, c4)), const_spec((1, c4)),
            const_spec((c4, c)), const_spec((1, c)),
            const_spec((1, c4)), const_spec((1, c4)),
        ],
        out_specs=img_spec(),
        out_shape=jax.ShapeDtypeStruct((b, r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * r * c * c4,
            bytes_accessed=3 * b * r * c * y.dtype.itemsize,
            transcendentals=b * r * c4,
        ),
        interpret=interpret,
    )(
        y, x, w1,
        b1.reshape(1, c4).astype(jnp.float32),
        w2, b2.reshape(1, c).astype(jnp.float32),
        gamma.reshape(1, c4).astype(jnp.float32),
        beta.reshape(1, c4).astype(jnp.float32),
    )


def _ln_block_kernel(
    h_ref, x_ref, lns_ref, lnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
    o_ref,
):
    # LayerNorm + MLP + GRN + residual for one image, VMEM-resident.
    # (The 7x7 depthwise conv stays on the XLA path: its VPU MACs are
    # near speed-of-light there, and a 49-tap shifted-FMA Pallas version
    # measured SLOWER — sublane-shift relayouts beat the saved HBM pass.)
    # Folding LN here removes its HBM round-trip: one read of the conv
    # output + residual, one write of the block output.
    acc = h_ref[0].astype(jnp.float32)  # (R, C) raw dwconv output
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = (acc - mean) * jax.lax.rsqrt(var + 1e-6)
    y = (y * lns_ref[0] + lnb_ref[0]).astype(x_ref.dtype)

    h32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h32 = jax.nn.gelu(h32, approximate=True)
    h = h32.astype(y.dtype)
    gx = jnp.sqrt(
        jnp.sum(h.astype(jnp.float32) ** 2, axis=0, keepdims=True) + 1e-12
    )
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    hhv = g_ref[:] * (h.astype(jnp.float32) * nx) + be_ref[:] + h.astype(jnp.float32)
    out = jnp.dot(
        hhv.astype(y.dtype), w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def convnext_block_fused(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma, beta,
    interpret: bool = False,
):
    """ConvNeXtV2 block with the dwconv on XLA and everything after it
    (LayerNorm -> pw1 -> GELU -> GRN -> pw2 -> +residual) in one per-image
    Pallas kernel.

    x: (B, H, W, C) block input (also the residual); dw_kernel (7, 7, C);
    dw_bias/ln_scale/ln_bias (C,); w1 (C, 4C), w2 (4C, C), b1/gamma/beta
    (4C,), b2 (C,). Returns (B, H, W, C) in x.dtype.
    Reference role: timm ConvNeXtV2 block (model.py ConvNeXtV2 backbones).
    """
    b, hh, ww, c = x.shape
    c4 = w1.shape[1]
    r = hh * ww

    h = jax.lax.conv_general_dilated(
        x, dw_kernel.reshape(7, 7, 1, c).astype(x.dtype),
        window_strides=(1, 1), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + dw_bias.astype(x.dtype)

    def img_spec():
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _ln_block_kernel,
        grid=(b,),
        in_specs=[
            img_spec(), img_spec(),
            const_spec((1, c)), const_spec((1, c)),
            const_spec((c, c4)), const_spec((1, c4)),
            const_spec((c4, c)), const_spec((1, c)),
            const_spec((1, c4)), const_spec((1, c4)),
        ],
        out_specs=img_spec(),
        out_shape=jax.ShapeDtypeStruct((b, r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * r * c * c4,
            bytes_accessed=3 * b * r * c * x.dtype.itemsize,
            transcendentals=b * r * c4,
        ),
        interpret=interpret,
    )(
        h.reshape(b, r, c), x.reshape(b, r, c),
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        w1, b1.reshape(1, c4).astype(jnp.float32),
        w2, b2.reshape(1, c).astype(jnp.float32),
        gamma.reshape(1, c4).astype(jnp.float32),
        beta.reshape(1, c4).astype(jnp.float32),
    )
    return out.reshape(b, hh, ww, c)


def fused_mlp_enabled(dtype) -> bool:
    """bf16 on TPU only (f32 keeps the exact-GELU XLA path); XMIR_FUSED_MLP
    overrides (0/1)."""
    flag = os.environ.get("XMIR_FUSED_MLP", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
