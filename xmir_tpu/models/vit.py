"""Vision Transformer backbone (DINOv2 / RAD-DINO style) in Flax.

Covers the reference's timm `vit_base_patch14_dinov2.lvd142m` (model.py:448-494)
and `microsoft/rad-dino` teacher (model.py:338-415): pre-norm blocks with
LayerScale, CLS token + learned position embeddings, patch 14.

Attention weights are FIRST-CLASS OUTPUTS (pass output_attentions=True) — the
reference performs "eager attention" surgery on HF models to get them back
(model.py:496-533); here the design simply returns them, which is also what
the attention-rollout explainer consumes (explanations.py:979-1147).
"""
from __future__ import annotations

import flax.linen as nn

from .activations import adaptive_gelu
import jax.numpy as jnp

from ..ops.ln_dense_pallas import ln_dense_fused, ln_qkv_fused


class DenseParams(nn.Module):
    """Raw kernel/bias with nn.Dense-compatible naming, shapes, and init —
    lets the caller contract them with a custom einsum (head-major output)
    while converted checkpoints keep loading under the same param tree."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """nn.LayerNorm's params (same names/shapes/init) WITHOUT applying the
    norm — lets the block hand scale/bias to a fused LN+projection kernel
    while keeping the checkpoint tree identical to the nn.LayerNorm path."""
    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, output_attentions: bool = False, ln=None):
        b, n, c = x.shape
        h = self.num_heads
        head_dim = self.dim // h
        w, bias = DenseParams(3 * self.dim, self.qkv_bias, name="qkv")(c)
        # nn.Dense promote_dtype semantics: compute in the widest of x/w
        compute_dtype = jnp.promote_types(x.dtype, w.dtype)
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)

        from ..ops.plain_attn import flash_attention_plain, plain_flash_enabled

        if ln is not None:
            # fused pre-LN + packed qkv (ops/ln_dense_pallas.py): one HBM
            # read of the residual stream, head-major emission; the caller
            # only passes ln when fused_ln_enabled() and the shape is
            # eligible, and the attention itself must be the fused kernel
            # (the XLA einsum path would re-materialize (B,H,N,N) scores)
            q, k, v = ln_qkv_fused(x, ln[0], ln[1], w, bias, h)
            out = flash_attention_plain(q, k, v, head_dim**-0.5)
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
            return nn.Dense(self.dim, name="proj")(out), None

        if not output_attentions and plain_flash_enabled(x.dtype, n):
            # head-major projection: contracting against the (C, 3, H, hd)
            # reshaped kernel with heads ordered before tokens lets XLA fold
            # the N<->H transpose into the matmul's output layout instead of
            # materializing three (B, N, H, hd) copies afterwards
            qkv = jnp.einsum("bnc,cthd->tbhnd", x, w.reshape(c, 3, h, head_dim))
            if bias is not None:
                qkv = qkv + bias.reshape(3, 1, h, 1, head_dim).astype(qkv.dtype)
            out = flash_attention_plain(qkv[0], qkv[1], qkv[2], head_dim**-0.5)
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
            return nn.Dense(self.dim, name="proj")(out), None

        qkv = x @ w
        if bias is not None:
            qkv = qkv + bias.astype(qkv.dtype)
        qkv = qkv.reshape(b, n, 3, h, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, H, hd)
        q = jnp.swapaxes(q, 1, 2)  # (B, H, N, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        if output_attentions:
            return out, attn
        return out, None


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, ln=None):
        if ln is not None:
            # fused pre-LN + fc1 + tanh-GELU (bf16-exact; same policy note
            # as ops/convnext_block_pallas.py) — removes the norm2 HBM
            # round-trip of the residual stream
            b, n, c = x.shape
            w1, b1 = DenseParams(self.hidden, True, name="fc1")(c)
            h = ln_dense_fused(
                x.reshape(b * n, c), ln[0], ln[1],
                w1.astype(x.dtype), b1, 1e-6, "gelu",
            )
            return nn.Dense(self.dim, name="fc2")(h.reshape(b, n, self.hidden))
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = adaptive_gelu(x)
        x = nn.Dense(self.dim, name="fc2")(x)
        return x


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_layerscale: bool = True

    @nn.compact
    def __call__(self, x, output_attentions: bool = False):
        from ..ops.ln_dense_pallas import fused_ln_enabled, ln_qkv_eligible
        from ..ops.plain_attn import plain_flash_enabled

        hidden = int(self.dim * self.mlp_ratio)
        head_dim = self.dim // self.num_heads
        fuse_ln = (
            not output_attentions
            and fused_ln_enabled(x.dtype)
            and ln_qkv_eligible(self.dim, head_dim)
            and hidden % 128 == 0
            and plain_flash_enabled(x.dtype, x.shape[1])
        )
        if fuse_ln:
            import os

            # pre-LNs fold into their projections (ops/ln_dense_pallas.py);
            # the param tree is identical to the nn.LayerNorm branch below.
            # Measured on DINOv2 (BENCHMARKS.md round-4 fused-LN notes):
            # qkv fusion +9% (330 -> 360 img/s); the fc1 fusion LOSES 20%
            # (XLA's MLP already runs 90% MFU and pipelines K-chunks the
            # monolithic kernel dot cannot), so it defaults OFF and stays
            # behind the knob for re-measurement on future libtpu.
            fuse_qkv = os.environ.get("XMIR_FUSED_LN_QKV", "1") != "0"
            fuse_mlp = os.environ.get("XMIR_FUSED_LN_MLP", "0") == "1"
            if fuse_qkv:
                ln1 = LayerNormParams(self.dim, name="norm1")()
                h, attn = MultiHeadAttention(
                    self.dim, self.num_heads, name="attn"
                )(x, output_attentions, ln=ln1)
            else:
                h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
                h, attn = MultiHeadAttention(
                    self.dim, self.num_heads, name="attn"
                )(h, output_attentions)
            if self.use_layerscale:
                h = LayerScale(self.dim, name="ls1")(h)
            x = x + h
            if fuse_mlp:
                ln2 = LayerNormParams(self.dim, name="norm2")()
                h = Mlp(self.dim, hidden, name="mlp")(x, ln=ln2)
            else:
                h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
                h = Mlp(self.dim, hidden, name="mlp")(h)
            if self.use_layerscale:
                h = LayerScale(self.dim, name="ls2")(h)
            return x + h, attn
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h, attn = MultiHeadAttention(self.dim, self.num_heads, name="attn")(
            h, output_attentions
        )
        if self.use_layerscale:
            h = LayerScale(self.dim, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(self.dim, hidden, name="mlp")(h)
        if self.use_layerscale:
            h = LayerScale(self.dim, name="ls2")(h)
        return x + h, attn


def interpolate_pos_embed(pos_embed, num_patches_new, num_prefix_tokens=1):
    """Bilinear-resample grid position embeddings to a new patch count."""
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    n_old = grid.shape[1]
    g_old = int(round(n_old**0.5))
    g_new = int(round(num_patches_new**0.5))
    if g_old == g_new:
        return pos_embed
    import jax

    grid = grid.reshape(1, g_old, g_old, -1)
    grid = jax.image.resize(grid, (1, g_new, g_new, grid.shape[-1]), "bilinear")
    grid = grid.reshape(1, g_new * g_new, -1)
    return jnp.concatenate([prefix, grid], axis=1)


class ViTBackbone(nn.Module):
    """DINOv2-style ViT.

    Returns {"cls": (B, D) final-norm CLS token, "tokens": (B, N, D) final-norm
    patch tokens, "attentions": optional list of (B, H, N+1, N+1)}.
    """

    img_size: int = 518
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_layerscale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, output_attentions: bool = False):
        b, h, w, _ = x.shape
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6), (1, 1, self.dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        num_patches_ref = (self.img_size // self.patch_size) ** 2
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, num_patches_ref + 1, self.dim),
        )
        pos = interpolate_pos_embed(pos, gh * gw)
        x = x + pos

        attentions = [] if output_attentions else None
        for i in range(self.depth):
            x, attn = ViTBlock(
                self.dim,
                self.num_heads,
                self.mlp_ratio,
                self.use_layerscale,
                name=f"block{i}",
            )(x, output_attentions)
            if output_attentions:
                attentions.append(attn)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return {
            "cls": x[:, 0],
            "tokens": x[:, 1:],
            "attentions": attentions,
        }


def vit_base_patch14_dinov2() -> ViTBackbone:
    return ViTBackbone(img_size=518, patch_size=14, dim=768, depth=12, num_heads=12)


def rad_dino_backbone() -> ViTBackbone:
    """microsoft/rad-dino is a DINOv2 ViT-B/14 at 518 (HF Dinov2Model layout)."""
    return ViTBackbone(img_size=518, patch_size=14, dim=768, depth=12, num_heads=12)
