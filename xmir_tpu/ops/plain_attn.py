"""Flash attention for the plain (non-windowed) ViT towers.

MedSigLIP SO400M at 448px materializes (B, 16, 1024, 1024) attention
tensors in HBM per layer x 27 layers — the same bandwidth sink the Swin
kernel removed. The stock Pallas TPU flash-attention kernel streams K/V
blocks through VMEM with an online softmax, so the score matrix never
reaches HBM. Sequence lengths that aren't 128-multiples (DINOv2's 1370,
ConceptCLIP's 729) are zero-padded with segment-id masking: padded keys
never contribute to real queries, so real-token outputs are exact.

Enabled on TPU for bf16 compute (f32 keeps the XLA einsum path for
bit-level converted-checkpoint parity); XMIR_FLASH_ATTN=0/1 overrides.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def flash_attention_plain(q, k, v, sm_scale: float):
    """softmax(q @ k^T * sm_scale) @ v via the TPU flash kernel.

    q, k, v: (B, H, N, hd). Returns (B, H, N, hd) in v.dtype."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    n_pad = -(-n // 128) * 128
    block = next(bs for bs in (512, 256, 128) if n_pad % bs == 0)
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


def plain_flash_enabled(dtype, n: int = 256) -> bool:
    flag = os.environ.get("XMIR_FLASH_ATTN", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # lengths that pad to a multiple of 256 keep >=256 K/V blocks; 128-blocks
    # (e.g. DINOv2's 1370 -> 1408) drown in grid overhead and run SLOWER
    # than the XLA path — measured 192 -> 85 img/s — so fall back there
    n_pad = -(-n // 128) * 128
    return (
        dtype == jnp.bfloat16
        and n_pad % 256 == 0
        and jax.default_backend() == "tpu"
    )
