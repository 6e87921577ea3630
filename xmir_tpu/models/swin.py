"""SwinV2 backbone in Flax (NHWC).

Implements the timm `swinv2_base_window12to24_192to384` graph used by the
reference (model.py:418-445): post-norm residual blocks, cosine attention with
learnable per-head temperature, log-spaced continuous relative position bias
(2-layer MLP), shifted windows, and SwinV2-order patch merging (reduce->norm).

Window partitioning is pure reshapes on static shapes, so the whole network
jits into fused MXU matmuls; the shifted-window masks are computed host-side
at trace time.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Sequence

import flax.linen as nn

from .activations import adaptive_gelu
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _rel_coords_table(win: int, pretrained_win: int):
    """Log-spaced relative coordinate table, (2W-1, 2W-1, 2) float32."""
    coords = np.arange(-(win - 1), win, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)  # (2W-1,2W-1,2)
    denom = max(pretrained_win - 1, 1)
    table = table / denom * 8.0
    table = np.sign(table) * np.log2(1.0 + np.abs(table)) / np.log2(8.0)
    return table


@functools.lru_cache(maxsize=64)
def _rel_position_index(win: int):
    coords = np.stack(
        np.meshgrid(np.arange(win), np.arange(win), indexing="ij"), axis=0
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, W², W²)
    rel = rel.transpose(1, 2, 0) + (win - 1)
    return (rel[..., 0] * (2 * win - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _axis_onehot(win: int):
    """(win, win, 2*win-1) f32 one-hot: O[a, b, d] = 1 iff d == a - b + win-1.

    The relative-position bias gather is block-Toeplitz per axis, so
    expanding the (2W-1, 2W-1, H) table to (H, W², W²) factorizes into two
    one-hot matmuls — EXACT (one 1.0 per row, no accumulation) and ~100x
    faster on TPU than the 331k-row gather + 21MB minor-dim transpose it
    replaces (0.86ms -> ~0.05ms per block at window 24)."""
    a = np.arange(win)
    d = a[:, None] - a[None, :] + win - 1  # (win, win)
    out = np.zeros((win, win, 2 * win - 1), np.float32)
    out[a[:, None], a[None, :], d] = 1.0
    return out


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(grid: int, win: int, shift: int):
    """(num_windows, W², W²) additive mask for shifted-window attention."""
    if shift == 0:
        return None
    img = np.zeros((grid, grid), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(grid // win, win, grid // win, win)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, win * win)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, win):
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)


def window_reverse(x, win, h, w):
    b = x.shape[0] // ((h // win) * (w // win))
    x = x.reshape(b, h // win, w // win, win, win, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window: int
    pretrained_window: int
    num_windows: int = 1  # windows per image (for the fused-kernel layout)

    @nn.compact
    def __call__(self, x, mask=None, output_attentions: bool = False,
                 train: bool = False):
        # x: (num_windows*B, W², C)
        bw, n, _ = x.shape
        hd = self.dim // self.num_heads
        qkv_w = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (self.dim, 3 * self.dim)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = x @ qkv_w + qkv_bias
        qkv = qkv.reshape(bw, n, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)  # (BW, H, N, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        # cosine attention with learnable per-head temperature
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(math.log(10.0)),
            (self.num_heads, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))

        # continuous position bias: MLP on the (2W-1, 2W-1) coord table, then
        # Toeplitz one-hot expansion straight into (H, N, N) layout (exact
        # replacement for the reference's flat gather, see _axis_onehot)
        win = self.window
        table = jnp.asarray(_rel_coords_table(win, self.pretrained_window))
        h1 = nn.Dense(512, name="cpb_fc1")(table)
        h1 = nn.relu(h1)
        bias_table = nn.Dense(self.num_heads, use_bias=False, name="cpb_fc2")(h1)
        t2 = 16.0 * nn.sigmoid(bias_table)  # (2W-1, 2W-1, H), sigmoid pre-expand
        oh = jnp.asarray(_axis_onehot(win))  # (W, W, 2W-1)
        g1 = jnp.einsum("ykd,dch->ykch", oh, t2.astype(jnp.float32))
        bias = jnp.einsum("ykch,xlc->hyxkl", g1, oh)  # (H, Wy, Wx, Wy, Wx)
        bias = bias.reshape(self.num_heads, n, n)

        from ..ops.window_attn_pallas import (
            fused_attention_enabled,
            window_attention_fused,
        )

        # f32 compute keeps the XLA path for checkpoint parity (qkv carries
        # the promoted dtype), as in vit.py/siglip.py. Training uses the
        # kernel too since round 3: its custom_vjp backward is the
        # single-pass Pallas kernel (_bwd_kernel_biased) for bf16 on TPU —
        # measured 36x the XLA recompute on the stage-2 window shape and
        # closer to the f32 grad oracle than the bf16 XLA backward (the
        # kernel keeps softmax and the cosine chain in f32 VMEM).
        if not output_attentions and fused_attention_enabled(qkv.dtype):
            # fold shift masks into the bias, group rows as (window, head)
            # with the image batch minor, and run a fused VMEM-resident
            # kernel (no (BW, H, N, N) attention tensor ever reaches HBM)
            nw = self.num_windows
            nh = self.num_heads
            b_img = bw // nw
            qs = (qn * scale[None]).astype(qn.dtype)

            # the kept-for-comparison v1 kernel has no vjp: eval only
            if os.environ.get("XMIR_SWIN_KERNEL", "") == "v1" and not train:
                total = bias[None].astype(jnp.float32)  # (1, H, N, N)
                if mask is not None:
                    total = total + mask[:, None, :, :]  # (nw, H, N, N)

                def to_wbhnd(t):
                    t = t.reshape(b_img, nw, nh, n, hd)
                    return jnp.transpose(t, (1, 0, 2, 3, 4))

                out = window_attention_fused(
                    to_wbhnd(qs), to_wbhnd(kn), to_wbhnd(v), total
                )
                # (nw, B, H, N, hd) -> (B, nw, N, H, hd) -> (BW, N, C)
                out = jnp.transpose(out, (1, 0, 3, 2, 4)).reshape(bw, n, self.dim)
                return nn.Dense(self.dim, name="proj")(out), None

            # round-2 single-pass kernel: whole-window query tiles, one-pass
            # softmax with deferred normalization, cosine q/k normalization
            # and the per-head logit scale applied in VMEM. Fold order
            # (head, window, image) keeps each bias block resident across
            # consecutive grid steps: without a shift mask the (H, N, N)
            # bias slice is shared by all nw*B rows of a head; with one,
            # the (H*nw, N, N) slice by the B rows of a (head, window) pair.
            from ..ops.vit_attn_pallas import biased_attention_fused

            scale_h = scale.reshape(nh)
            if mask is not None:
                total = (bias[:, None] + mask[None, :, :, :]).reshape(-1, n, n)
                scale_g = jnp.repeat(scale_h, nw)
                g_size = b_img
            else:
                total = bias  # (H, N, N)
                scale_g = scale_h
                g_size = nw * b_img

            def fold(t):  # (BW, H, N, hd) -> (H*nw*B, N, hd)
                t = t.reshape(b_img, nw, nh, n, hd)
                return jnp.transpose(t, (2, 1, 0, 3, 4)).reshape(-1, n, hd)

            out = biased_attention_fused(
                fold(q), fold(k), fold(v), total, scale_g, g_size, True
            )
            out = out.reshape(nh, nw, b_img, n, hd)
            out = jnp.transpose(out, (2, 1, 3, 0, 4)).reshape(bw, n, self.dim)
            return nn.Dense(self.dim, name="proj")(out), None

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qn, kn, preferred_element_type=jnp.float32
        ) * scale
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None, :, :]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = jnp.swapaxes(out, 1, 2).reshape(bw, n, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        return (out, attn) if output_attentions else (out, None)


class SwinV2Block(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    pretrained_window: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C); post-norm residuals (SwinV2)
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        shift = 0 if win >= h else self.shift

        shortcut = x
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, win)
        mask_np = _shift_attn_mask(h, win, shift)
        mask = jnp.asarray(mask_np) if mask_np is not None else None
        xw, _ = WindowAttentionV2(
            self.dim, self.num_heads, win, min(self.pretrained_window, win),
            num_windows=(h // win) * (w // win), name="attn",
        )(xw, mask, train=train)
        x = window_reverse(xw, win, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        h2 = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(x)
        h2 = adaptive_gelu(h2)
        h2 = nn.Dense(self.dim, name="mlp_fc2")(h2)
        return x + nn.LayerNorm(epsilon=1e-5, name="norm2")(h2)


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # timm order: [0::2,0::2], [1::2,0::2], [0::2,1::2], [1::2,1::2]
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SwinV2Backbone(nn.Module):
    """Returns {"features": (B, h, w, C) final map, "pooled": (B, C) post-norm GAP}."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 24
    pretrained_window: Sequence[int] = (12, 12, 12, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            if i > 0:
                dim *= 2
                x = PatchMerging(dim, name=f"merge{i}")(x)
            for j in range(depth):
                x = SwinV2Block(
                    dim,
                    self.num_heads[i],
                    self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    pretrained_window=self.pretrained_window[i],
                    name=f"stage{i}_block{j}",
                )(x, train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        features = x
        pooled = jnp.mean(x, axis=(1, 2))
        return {"features": features, "pooled": pooled}


def swinv2_base_window12to24_192to384() -> SwinV2Backbone:
    return SwinV2Backbone(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=24,
        pretrained_window=(12, 12, 12, 6),
    )
