"""Pallas TPU kernel: fused SwinV2 window attention.

Why: SwinV2-Base at 384px materializes (windows x batch, heads, 576, 576)
attention tensors in HBM for every block — logits, +bias, +mask, softmax —
several full HBM passes per block. That made the XLA path HBM-bound at ~3%
MXU (BENCHMARKS.md round 1). This kernel keeps the whole per-(window, head)
attention in VMEM: one dot for the cosine logits, add the (CPB bias +
shift-mask) term, softmax in f32, and the value dot — HBM sees only
q/k/v/out plus one pass of the combined bias.

Layout: the caller reorders windows to the LEADING axis,
  q_scaled, k_norm, v : (NW, B, H, N, D)
  bias                : (NWB, H, N, N)  f32, NWB in {1, NW}
so the grid (H, NW, B) keeps the per-(window, head) bias block resident in
VMEM across the whole B-inner loop (one bias fetch per (window, head), not
per step). Cosine normalization and the per-head logit scale are folded into
q outside the kernel (elementwise, fused into the qkv projection by XLA).

N and D need no host-side padding: Swin's window sizes (576 = 24x24,
144 = 12x12 tokens) are sublane-aligned, and Mosaic masks the minor
dimension internally.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
    # blocks: q/k/v/o (1, B, 1, N, D); bias (1, 1, N, N). The whole image
    # batch of one (window, head) runs per grid step — bias stays resident
    # and the ~10x fewer grid steps amortize per-step dispatch overhead.
    bias = b_ref[0, 0]
    for i in range(q_ref.shape[1]):  # static unroll over the batch
        q = q_ref[0, i, 0]  # (N, D), cosine-normalized * per-head scale
        k = k_ref[0, i, 0]
        v = v_ref[0, i, 0]
        attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        attn = attn + bias
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp(attn)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, i, 0] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_attention_fused(q_scaled, k_norm, v, bias, interpret: bool = False):
    """Fused softmax((q_scaled @ k_norm^T) + bias) @ v per (window, head).

    q_scaled/k_norm/v: (NW, B, H, N, D); bias: (NWB, H, N, N) f32 with
    NWB == NW (per-window shift masks folded in) or 1 (no shift).
    Returns (NW, B, H, N, D) in v.dtype.
    """
    nw, b, h, n, d = q_scaled.shape
    nwb = bias.shape[0]

    # batch sub-block: as many images per step as VMEM allows (double-
    # buffered q/k/v/o blocks + bias + ~3 live f32 attention buffers)
    itemsize = jnp.dtype(q_scaled.dtype).itemsize

    def vmem_est(bb):
        return 2 * 4 * bb * n * d * itemsize + 2 * n * n * 4 + 3 * n * n * 4

    bb_sz = b
    while bb_sz > 1 and vmem_est(bb_sz) > 24 * 1024 * 1024:
        bb_sz = max(1, bb_sz // 2)
    while b % bb_sz:
        bb_sz -= 1

    def qkv_spec():
        return pl.BlockSpec(
            (1, bb_sz, 1, n, d),
            lambda hh, w, bb: (w, bb, hh, 0, 0),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec(
        (1, 1, n, n),
        (lambda hh, w, bb: (w, hh, 0, 0))
        if nwb > 1
        else (lambda hh, w, bb: (0, hh, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _kernel,
        grid=(h, nw, b // bb_sz),
        in_specs=[qkv_spec(), qkv_spec(), qkv_spec(), bias_spec],
        out_specs=qkv_spec(),
        out_shape=jax.ShapeDtypeStruct((nw, b, h, n, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nw * b * h * n * n * d,
            bytes_accessed=(
                4 * nw * b * h * n * d * q_scaled.dtype.itemsize
                + nwb * h * n * n * 4
            ),
            transcendentals=nw * b * h * n * n,
        ),
        interpret=interpret,
    )(q_scaled, k_norm, v, bias)


def fused_attention_enabled(dtype=None) -> bool:
    """Use the fused kernel on TPU unless XMIR_FUSED_ATTN=0.

    Pass the promoted compute dtype to apply the same policy as
    plain_flash_enabled: f32 activations keep the XLA path. On the MXU an
    f32 matmul decomposes into bf16 passes, and the kernel's single-pass
    decomposition differs from the XLA einsum's — measured ~3e-2 drift on
    the scale-21 cosine softmax — so f32 (the checkpoint-parity/oracle
    configuration) stays bit-comparable to the reference stack while bf16
    serving, whose input rounding already dwarfs that, takes the kernel."""
    flag = os.environ.get("XMIR_FUSED_ATTN", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    if dtype is not None and jnp.dtype(dtype) != jnp.bfloat16:
        return False
    return jax.default_backend() == "tpu"
