"""Embedding model wrappers — the TPU-native equivalents of the reference's
model zoo classes (model.py:9-761, nih_multilabel_retrieval.py:170-257).

Every model outputs a dict with at least:
  embedding:  (B, D) L2-normalized retrieval embedding
plus model-specific extras (logits, features, tokens, attentions,
teacher_embedding, ...). Intermediate features are first-class outputs, which
is what makes the XAI engine hook-free (SURVEY.md §7 step 7).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize
from .ath import ATHNet
from .bert import BertTextBackbone
from .convnext import ConvNeXtV2Backbone
from .densenet import DenseNetBackbone
from .heads import MedSigLIPProjection, NIHProjectionHead, PCAMPool, SRA
from .resnet import ResNetBackbone
from .siglip import SiglipVisionBackbone
from .swin import SwinV2Backbone
from .vit import ViTBackbone


class TinyEmbedder(nn.Module):
    """Small 3-conv debug backbone (not in the reference): compiles in
    seconds, used by CLI smoke tests and quick local experiments. Same output
    contract as every production embedder."""

    embedding_dim: Optional[int] = None
    num_labels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i, ch in enumerate((16, 32, 64)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"backbone_conv{i}")(h)
            h = nn.relu(h)
        features = h
        feat = jnp.mean(h, axis=(1, 2))
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        result = {"embedding": l2_normalize(feat, axis=1), "features": features}
        if self.num_labels:
            result["logits"] = nn.Dense(self.num_labels, name="classification_head")(feat)
        return result


class DenseNet121Embedder(nn.Module):
    embedding_dim: Optional[int] = None
    num_labels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = DenseNetBackbone(name="backbone")(x, train)
        feat = out["pooled"]
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        result = {"embedding": l2_normalize(feat, axis=1), "features": out["features"]}
        if self.num_labels:
            result["logits"] = nn.Dense(self.num_labels, name="classification_head")(feat)
        return result


class ResNet50Embedder(nn.Module):
    embedding_dim: Optional[int] = None
    num_labels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ResNetBackbone(name="backbone")(x, train)
        feat = out["pooled"]
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        result = {"embedding": l2_normalize(feat, axis=1), "features": out["features"]}
        if self.num_labels:
            result["logits"] = nn.Dense(self.num_labels, name="classification_head")(feat)
        return result


class ConvNeXtV2Embedder(nn.Module):
    """timm num_classes=0 semantics: GAP -> head LayerNorm -> optional fc
    (reference model.py:87-117)."""

    embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNeXtV2Backbone(name="backbone")(x, train)
        feat = out["pooled_norm"]
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        return {"embedding": l2_normalize(feat, axis=1), "features": out["features"]}


class ConvNeXtV2SRAEmbedder(nn.Module):
    """forward_features -> SRA (sharing the head LayerNorm params) -> normalize
    (reference model.py:165-196)."""

    num_heads: int = 8
    lam: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNeXtV2Backbone(name="backbone")(x, train)
        feat = SRA(1024, self.num_heads, self.lam, name="sra")(
            out["features"], out["head_norm"]
        )
        return {"embedding": l2_normalize(feat, axis=1), "features": out["features"]}


class ConvNeXtV2PCAMEmbedder(nn.Module):
    """forward_features -> PCAM pooling (reference model.py:249-278)."""

    num_classes: int = 3
    lam: float = 0.1
    embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNeXtV2Backbone(name="backbone")(x, train)
        embedding, class_logits, pcam_probs = PCAMPool(
            1024, self.num_classes, self.lam, self.embedding_dim, name="pcam"
        )(out["features"], out["head_norm"])
        result = {"embedding": embedding, "features": out["features"]}
        if train:
            result.update({"class_logits": class_logits, "pcam_maps": pcam_probs})
        return result


class SwinV2Embedder(nn.Module):
    embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = SwinV2Backbone(name="backbone")(x, train)
        feat = out["pooled"]
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        return {"embedding": l2_normalize(feat, axis=1), "features": out["features"]}


class DinoV2Embedder(nn.Module):
    """DINOv2 CLS-token embedder (reference model.py:448-494). Partial
    fine-tuning (unfreeze last N blocks) is an OPTIMIZER concern here — see
    train/optim.py trainable-mask helpers — not a parameter-flag mutation."""

    embedding_dim: Optional[int] = None
    img_size: int = 518
    # backbone width/depth overrides (ViT-B/14 defaults; smaller configs for
    # tests and multichip dryruns)
    dim: int = 768
    depth: int = 12
    num_heads: int = 12

    @nn.compact
    def __call__(self, x, train: bool = False, output_attentions: bool = False):
        out = ViTBackbone(
            img_size=self.img_size, dim=self.dim, depth=self.depth,
            num_heads=self.num_heads, name="backbone",
        )(x, train, output_attentions)
        feat = out["cls"]
        if self.embedding_dim:
            feat = nn.Dense(self.embedding_dim, name="fc")(feat)
        return {
            "embedding": l2_normalize(feat, axis=1),
            "tokens": out["tokens"],
            "attentions": out["attentions"],
        }


class MedSigLIPEmbedder(nn.Module):
    """SigLIP vision tower + trainable projection head
    (reference model.py:536-634)."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False, output_attentions: bool = False,
                 token_delta=None):
        out = SiglipVisionBackbone(
            img_size=448, patch_size=14, dim=1152, depth=27, num_heads=16,
            intermediate=4304, name="backbone",
        )(x, train, output_attentions, token_delta=token_delta)
        emb = MedSigLIPProjection(self.embed_dim, name="projection")(out["pooled"])
        return {
            "embedding": l2_normalize(emb, axis=1),
            "tokens": out["tokens"],
            "encoder_tokens": out["encoder_tokens"],
            "attentions": out["attentions"],
        }


class DistillEmbedder(nn.Module):
    """ConvNeXtV2 student + ViT teacher (DINOv2 or RAD-DINO style), reference
    model.py:281-415. The teacher runs under stop_gradient when frozen; its
    input is resized to the teacher's native resolution.

    For RAD-DINO parity, inputs normalized with ImageNet stats are converted
    to RAD-DINO stats inside the forward (model.py:371-380).
    """

    embedding_dim: Optional[int] = None
    teacher_img_size: int = 518
    teacher_trainable: bool = False
    rad_dino_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        student = ConvNeXtV2Embedder(self.embedding_dim, name="student")(x, train)
        result = {"embedding": student["embedding"], "features": student["features"]}
        if train:
            tx = x
            if self.rad_dino_norm:
                imagenet_mean = jnp.asarray([0.485, 0.456, 0.406])
                imagenet_std = jnp.asarray([0.229, 0.224, 0.225])
                tx = jnp.clip(tx * imagenet_std + imagenet_mean, 0.0, 1.0)
            tx = jax.image.resize(
                tx,
                (x.shape[0], self.teacher_img_size, self.teacher_img_size, x.shape[3]),
                "bilinear",
            )
            if self.rad_dino_norm:
                tx = (tx - 0.5307) / 0.2583
            t_out = ViTBackbone(img_size=self.teacher_img_size, name="teacher")(tx)
            teacher_emb = l2_normalize(t_out["cls"], axis=1)
            if not self.teacher_trainable:
                teacher_emb = jax.lax.stop_gradient(teacher_emb)
            result["teacher_embedding"] = teacher_emb
        return result


class NIHDualHeadModel(nn.Module):
    """NIH multi-label dual-head retrieval model
    (reference nih_multilabel_retrieval.py:170-257). backbone in
    {"dinov2", "convnextv2"}."""

    backbone: str = "dinov2"
    num_labels: int = 14

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone == "dinov2":
            out = ViTBackbone(img_size=518, name="backbone")(x, train)
            feat = out["cls"]
            extra = {"cls_embedding": feat}
        elif self.backbone == "convnextv2":
            out = ConvNeXtV2Backbone(name="backbone")(x, train)
            feat = out["pooled_norm"]
            extra = {"backbone_embedding": feat}
        else:
            raise ValueError(f"unknown NIH backbone {self.backbone!r}")
        projection, logits = NIHProjectionHead(self.num_labels, name="head")(feat)
        return {
            **extra,
            "projection": projection,
            "embedding": l2_normalize(projection, axis=1),
            "logits": logits,
        }


class ConceptCLIPModel(nn.Module):
    """Dual-encoder ConceptCLIP-style model: SigLIP SO400M image tower +
    BERT text tower + learned logit_scale/logit_bias
    (reference model.py:636-761). Returns token-level image features for
    RC-Align."""

    embedding_dim: Optional[int] = None
    img_size: int = 384
    dim: int = 1152          # SO400M vision width
    depth: int = 27
    text_depth: int = 12
    text_vocab: int = 30522  # PubMedBERT vocab

    def setup(self):
        num_heads = next(h for h in (16, 8, 4, 2, 1) if self.dim % h == 0)
        self.visual = SiglipVisionBackbone(
            img_size=self.img_size, patch_size=14, dim=self.dim,
            depth=self.depth, num_heads=num_heads,
            intermediate=4304 if self.dim == 1152 else max(4 * self.dim, 64),
            name="visual",
        )
        text_dim = 768 if self.dim == 1152 else self.dim
        text_heads = next(h for h in (12, 8, 4, 2, 1) if text_dim % h == 0)
        self.text = BertTextBackbone(
            vocab_size=self.text_vocab, dim=text_dim, depth=self.text_depth,
            num_heads=text_heads, intermediate=4 * text_dim, name="text",
        )
        self.text_projection = nn.Dense(self.dim, name="text_projection")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(10.0)), ()
        )
        self.logit_bias = self.param(
            "logit_bias", nn.initializers.constant(-10.0), ()
        )
        if self.embedding_dim:
            self.fc = nn.Dense(self.embedding_dim, name="fc")

    def encode_image(self, pixel_values, train: bool = False):
        out = self.visual(pixel_values, train)
        return out["pooled"], out["tokens"]

    def encode_text(self, input_ids, attention_mask=None):
        out = self.text(input_ids, attention_mask)
        return self.text_projection(out["cls"])

    def forward_clip(self, pixel_values, input_ids, attention_mask=None, train: bool = False):
        img_feat, img_tokens = self.encode_image(pixel_values, train)
        txt_feat = self.encode_text(input_ids, attention_mask)
        return {
            "image_features": img_feat,
            "text_features": txt_feat,
            "image_token_features": img_tokens,
            "logit_scale": self.logit_scale,
            "logit_bias": self.logit_bias,
        }

    def __call__(self, pixel_values, train: bool = False):
        img_feat, img_tokens = self.encode_image(pixel_values, train)
        if self.embedding_dim:
            img_feat = self.fc(img_feat)
        return {"embedding": l2_normalize(img_feat, axis=1), "tokens": img_tokens}


class ATHEmbedder(nn.Module):
    """ATH hashing model wrapper returning a dict like the other embedders."""

    hash_size: int = 48
    num_classes: int = 5
    input_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        hash_codes, logits = ATHNet(
            self.hash_size, self.num_classes, self.input_size, name="ath"
        )(x, train)
        return {"embedding": hash_codes, "hash_codes": hash_codes, "logits": logits}
