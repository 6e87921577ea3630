"""Fused attention for the plain (non-windowed) ViT towers.

MedSigLIP SO400M at 448px materializes (B, 16, 1024, 1024) attention
tensors in HBM per layer x 27 layers — the same bandwidth sink the Swin
kernel removed. Round 1 used the stock Pallas TPU flash kernel; it tops
out ~43 TFLOP/s on these modest sequence lengths regardless of block
sizes (online-softmax bookkeeping dominates). Since a whole (N, D) K/V
pane fits VMEM outright at ViT sizes, the round-2 default is the
single-pass kernel in ops/vit_attn_pallas.py (~25% faster on both the
DINOv2 and MedSigLIP shapes); XMIR_FLASH_IMPL=stock reselects the stock
flash kernel.

Enabled on TPU for bf16 compute (f32 keeps the XLA einsum path for
bit-level converted-checkpoint parity); XMIR_FLASH_ATTN=0/1 overrides.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _stock_flash(q, k, v, sm_scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    # pad to the coarsest block multiple whose overhead stays small: large
    # K/V blocks amortize the flash grid overhead (measured: 512-blocks at
    # +12% padding beat 128-blocks at minimal padding, 2.1ms vs 3.4ms on
    # the DINOv2 shape)
    for block, max_ratio in ((512, 1.30), (256, 1.20), (128, 10.0)):
        n_pad = -(-n // block) * block
        if n_pad <= max_ratio * n:
            break
    block_sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block, block_k_dkv=block,
        block_q_dkv=block, block_k_major_dq=block, block_k_dq=block,
        block_q_dq=block,
    )
    if n_pad != n:
        pad = n_pad - n
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        seg = jnp.concatenate(
            [jnp.ones((b, n), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
            axis=1,
        )
        out = flash_attention(
            q, k, v, segment_ids=SegmentIds(seg, seg), sm_scale=sm_scale,
            block_sizes=block_sizes,
        )
        return out[:, :, :n]
    return flash_attention(q, k, v, sm_scale=sm_scale, block_sizes=block_sizes)


def flash_attention_plain(q, k, v, sm_scale: float):
    """softmax(q @ k^T * sm_scale) @ v, fused.

    q, k, v: (B, H, N, hd). Returns (B, H, N, hd) in v.dtype."""
    if os.environ.get("XMIR_FLASH_IMPL", "") == "stock":
        return _stock_flash(q, k, v, sm_scale)
    from .vit_attn_pallas import vit_attention_fused

    b, h, n, d = q.shape
    out = vit_attention_fused(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d),
        sm_scale,
    )
    return out.reshape(b, h, n, d)


# beyond this sequence length the single-pass kernel's f32 (tile_q, n_pad)
# score tiles overflow the 96MB scoped-VMEM limit even at batch fold 1
# (~7.2KB/key at tile_q=512); such shapes must take the XLA path. Model-zoo
# max is n=1370, so this is purely a safety ceiling.
_SINGLE_PASS_MAX_N = 12288


def plain_flash_enabled(dtype, n: int = 256) -> bool:
    flag = os.environ.get("XMIR_FLASH_ATTN", "")
    if flag == "0":
        return False
    if n > _SINGLE_PASS_MAX_N:
        return False
    if flag == "1":
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
