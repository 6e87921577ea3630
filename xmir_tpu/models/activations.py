"""Precision-adaptive activations.

XLA's exact (erf-based) GELU costs ~15-20 VPU ops per element; on the 4x
expanded MLP tensors it dominates whole ConvNeXt/Swin blocks (measured
1.07ms of a 2.14ms ConvNeXt stage-1 block on v5e). The tanh approximation's
maximum relative error (~1e-3) is BELOW bfloat16's rounding step (2^-8 ~
3.9e-3), so in bf16 compute the approximation is numerically
indistinguishable while ~3x cheaper. float32 paths keep the exact erf form
so converted-checkpoint parity (timm/HF use exact GELU for these towers)
stays bit-level."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def adaptive_gelu(x):
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))
