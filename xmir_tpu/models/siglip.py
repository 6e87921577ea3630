"""SigLIP vision tower in Flax — the MedSigLIP backbone and the
ConceptCLIP image encoder.

Mirrors the HF `SiglipVisionModel` graph (reference model.py:536-634 wraps
`google/medsiglip-448`.vision_model): patch-conv embedding (no CLS token),
learned position embeddings, pre-norm transformer with gelu_tanh MLPs,
post-LayerNorm, and a multihead-attention-pooling head (learned probe token).

Attention weights return as outputs on request — no "eager attention" surgery
needed (the reference's `_convert_sdpa_to_eager_attention`, model.py:496-533,
exists solely to recover them from torch SDPA).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class SiglipAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, output_attentions: bool = False, ln=None):
        b, n, c = x.shape
        h = self.num_heads
        hd = self.dim // h

        from .vit import DenseParams
        from ..ops.ln_dense_pallas import ln_qkv_fused
        from ..ops.plain_attn import flash_attention_plain, plain_flash_enabled

        ws, bs = [], []
        for name in ("q_proj", "k_proj", "v_proj"):
            w, bias = DenseParams(self.dim, True, name=name)(c)
            ws.append(w)
            bs.append(bias)
        # nn.Dense promote_dtype semantics: compute in the widest of x/w,
        # and gate the kernel on that promoted dtype (f32 params over bf16
        # activations keep the XLA path for checkpoint parity, as vit.py)
        dt = jnp.promote_types(x.dtype, ws[0].dtype)
        x = x.astype(dt)

        if ln is not None:
            # fused pre-LN + packed qkv (models/vit.py ln path, extended to
            # SO400M's hd=72 in round 5): the three per-head-standard
            # projection kernels concatenate along the output axis in
            # q|k|v order — exactly the packed (C, 3C) layout
            # ops/ln_dense_pallas.py's kernel splits head-major
            w3 = jnp.concatenate([w.astype(dt) for w in ws], axis=1)
            b3 = jnp.concatenate(bs)
            q, k, v = ln_qkv_fused(x, ln[0], ln[1], w3, b3, h)
            out = flash_attention_plain(q, k, v, hd**-0.5)
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
            return nn.Dense(self.dim, name="out_proj")(out), None

        if not output_attentions and plain_flash_enabled(dt, n):
            # one batched head-major projection: concatenate the three
            # separate q/k/v kernels (a parameter-sized concat, free next
            # to the activations) so a single wide matmul replaces three,
            # with the N<->H transpose folded into its output layout
            # (see models/vit.py)
            w3 = jnp.concatenate(
                [w.astype(dt).reshape(c, 1, h, hd) for w in ws], axis=1
            )  # (C, 3, H, hd)
            b3 = jnp.concatenate(
                [bias.reshape(1, 1, h, 1, hd) for bias in bs], axis=1
            )  # (1, 3, H, 1, hd)
            qkv = jnp.einsum("bnc,cthd->bthnd", x, w3)
            qkv = qkv + b3.astype(qkv.dtype)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            out = flash_attention_plain(q, k, v, hd**-0.5)
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
            return nn.Dense(self.dim, name="out_proj")(out), None

        q = x @ ws[0].astype(dt) + bs[0].astype(dt)
        k = x @ ws[1].astype(dt) + bs[1].astype(dt)
        v = x @ ws[2].astype(dt) + bs[2].astype(dt)

        def split(t):
            return jnp.swapaxes(t.reshape(b, n, self.num_heads, hd), 1, 2)

        q, k, v = split(q), split(k), split(v)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="out_proj")(out)
        return (out, attn) if output_attentions else (out, None)


class SiglipMlp(nn.Module):
    dim: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # HF gelu_pytorch_tanh
        x = nn.Dense(self.dim, name="fc2")(x)
        return x


class SiglipEncoderLayer(nn.Module):
    dim: int
    num_heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, output_attentions: bool = False):
        import os

        from ..ops.ln_dense_pallas import fused_ln_enabled, ln_qkv_eligible
        from ..ops.plain_attn import plain_flash_enabled

        # fused pre-LN + packed qkv (the models/vit.py ViTBlock gate,
        # extended to SO400M's hd=72 in round 5); param tree identical to
        # the nn.LayerNorm branch
        fuse_qkv = (
            not output_attentions
            and fused_ln_enabled(x.dtype)
            and ln_qkv_eligible(self.dim, self.dim // self.num_heads)
            and plain_flash_enabled(x.dtype, x.shape[1])
            and os.environ.get("XMIR_FUSED_LN_QKV", "1") != "0"
        )
        if fuse_qkv:
            from .vit import LayerNormParams

            ln1 = LayerNormParams(self.dim, name="layer_norm1")()
            h, attn = SiglipAttention(
                self.dim, self.num_heads, name="self_attn"
            )(x, output_attentions, ln=ln1)
        else:
            h = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
            h, attn = SiglipAttention(
                self.dim, self.num_heads, name="self_attn"
            )(h, output_attentions)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        h = SiglipMlp(self.dim, self.intermediate, name="mlp")(h)
        return x + h, attn


class SiglipPoolingHead(nn.Module):
    """Multihead attention pooling with a learned probe token."""

    dim: int
    num_heads: int
    intermediate: int

    @nn.compact
    def __call__(self, tokens):
        b = tokens.shape[0]
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, self.dim))
        probe = jnp.broadcast_to(probe, (b, 1, self.dim))
        # torch nn.MultiheadAttention: packed in-proj, out-proj
        hd = self.dim // self.num_heads

        def split(t, n):
            return jnp.swapaxes(t.reshape(b, n, self.num_heads, hd), 1, 2)

        q = nn.Dense(self.dim, name="attn_q")(probe)
        k = nn.Dense(self.dim, name="attn_k")(tokens)
        v = nn.Dense(self.dim, name="attn_v")(tokens)
        a = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q, 1), split(k, tokens.shape[1]),
            preferred_element_type=jnp.float32,
        ) * (hd**-0.5)
        a = nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), split(v, tokens.shape[1]))
        o = jnp.swapaxes(o, 1, 2).reshape(b, 1, self.dim)
        o = nn.Dense(self.dim, name="attn_out")(o)

        res = o
        h = nn.LayerNorm(epsilon=1e-6, name="layernorm")(o)
        h = SiglipMlp(self.dim, self.intermediate, name="mlp")(h)
        return (res + h)[:, 0]


class SiglipVisionBackbone(nn.Module):
    """Returns {"pooled": (B, D) MAP-head output, "tokens": (B, N, D)
    post-layernorm patch tokens, "attentions": optional per-layer list}."""

    img_size: int = 448
    patch_size: int = 14
    dim: int = 1152
    depth: int = 27
    num_heads: int = 16
    intermediate: int = 4304
    use_head: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, output_attentions: bool = False,
                 token_delta=None):
        b = x.shape[0]
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embedding",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        n = gh * gw
        x = x.reshape(b, n, self.dim)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            ((self.img_size // self.patch_size) ** 2, self.dim),
        )
        if pos.shape[0] != n:
            import jax

            g_old = int(round(pos.shape[0] ** 0.5))
            pos2 = pos.reshape(1, g_old, g_old, self.dim)
            pos2 = jax.image.resize(pos2, (1, gh, gw, self.dim), "bilinear")
            pos = pos2.reshape(n, self.dim)
        x = x + pos[None]

        attentions = [] if output_attentions else None
        for i in range(self.depth):
            x, attn = SiglipEncoderLayer(
                self.dim, self.num_heads, self.intermediate, name=f"layer{i}"
            )(x, output_attentions)
            if output_attentions:
                attentions.append(attn)
        # grad-CAM tap: d(score)/d(token_delta) equals the gradient at the
        # last encoder layer's output (the reference hooks this layer,
        # medsiglip_saliency.py:70-98); zeros leave the forward unchanged
        if token_delta is not None:
            x = x + token_delta
        encoder_tokens = x
        tokens = nn.LayerNorm(epsilon=1e-6, name="post_layernorm")(x)
        pooled = None
        if self.use_head:
            pooled = SiglipPoolingHead(
                self.dim, self.num_heads, self.intermediate, name="head"
            )(tokens)
        return {"pooled": pooled, "tokens": tokens,
                "encoder_tokens": encoder_tokens, "attentions": attentions}


def medsiglip_448_vision() -> SiglipVisionBackbone:
    """google/medsiglip-448 vision tower (So400m: 1152/27/16/4304, patch 14)."""
    return SiglipVisionBackbone(
        img_size=448, patch_size=14, dim=1152, depth=27, num_heads=16,
        intermediate=4304,
    )


def conceptclip_vision_384() -> SiglipVisionBackbone:
    """ConceptCLIP image encoder: SigLIP-ViT-SO400M-14 at 384 (729 patches)."""
    return SiglipVisionBackbone(
        img_size=384, patch_size=14, dim=1152, depth=27, num_heads=16,
        intermediate=4304,
    )
