"""SigLIP text tower in Flax — completes the MedSigLIP dual encoder for
image-text contrastive training (reference train_medsiglip.py trains the full
HF SigLIP model with sigmoid contrastive loss).

HF SiglipTextTransformer layout: token + position embeddings, the same
pre-norm encoder layers as the vision tower, final LayerNorm, pooled output =
head(last token).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .siglip import SiglipEncoderLayer


class SiglipTextBackbone(nn.Module):
    """Returns {"tokens": (B, N, D), "pooled": (B, D)}."""

    vocab_size: int = 256000
    dim: int = 1152
    depth: int = 27
    num_heads: int = 16
    intermediate: int = 4304
    max_position: int = 64

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        b, n = input_ids.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (self.max_position, self.dim),
        )
        x = x + pos[None, :n]
        # HF SigLIP text encoder runs full attention (padding handled by
        # canonical right-padding + last-token pooling)
        for i in range(self.depth):
            x, _ = SiglipEncoderLayer(
                self.dim, self.num_heads, self.intermediate, name=f"layer{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)
        pooled = nn.Dense(self.dim, name="head")(x[:, -1])
        return {"tokens": x, "pooled": pooled}


class MedSigLIPDualEncoder(nn.Module):
    """Full SigLIP dual encoder (vision + text + learned logit scale/bias)
    for MedSigLIP fine-tuning. Image-only retrieval goes through the
    MedSigLIPEmbedder wrapper instead."""

    img_size: int = 448
    text_vocab: int = 256000
    dim: int = 1152
    depth: int = 27
    num_heads: int = 16
    intermediate: int = 4304

    def setup(self):
        from .siglip import SiglipVisionBackbone

        self.vision = SiglipVisionBackbone(
            img_size=self.img_size, patch_size=14, dim=self.dim, depth=self.depth,
            num_heads=self.num_heads, intermediate=self.intermediate, name="vision",
        )
        self.text = SiglipTextBackbone(
            vocab_size=self.text_vocab, dim=self.dim, depth=self.depth,
            num_heads=self.num_heads, intermediate=self.intermediate, name="text",
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(10.0)), ()
        )
        self.logit_bias = self.param("logit_bias", nn.initializers.constant(-10.0), ())

    def get_image_features(self, pixel_values, train: bool = False):
        return self.vision(pixel_values, train)["pooled"]

    def get_text_features(self, input_ids, attention_mask=None):
        return self.text(input_ids, attention_mask)["pooled"]

    def __call__(self, pixel_values, input_ids, attention_mask=None, train: bool = False):
        return {
            "image_features": self.get_image_features(pixel_values, train),
            "text_features": self.get_text_features(input_ids, attention_mask),
            "logit_scale": self.logit_scale,
            "logit_bias": self.logit_bias,
        }


COVIDX_LABEL_TO_TEXT = {
    0: "A chest X-ray showing no evidence of pneumonia or COVID-19 infection.",
    1: "A chest X-ray showing findings consistent with pneumonia.",
    2: "A chest X-ray showing findings consistent with COVID-19 pneumonia.",
}
