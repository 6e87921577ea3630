"""BiomedCLIP dual encoder (open_clip
`hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224`).

The reference loads this tower through open_clip for its zero-shot
classification + image-image retrieval path (test.py:1218-1240, 237-347).
Architecture: timm ViT-B/16 @224 vision trunk (vanilla ViT, CLS pooling,
no layerscale) + linear projection to 512; HF PubMedBERT text tower with
CLS pooling + open_clip's 2-layer MLP projection (768 -> 640 -> 512); a
learned logit_scale initialized to ln(1/0.07).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..losses.metric_losses import l2_normalize
from .bert import BertTextBackbone
from .vit import ViTBackbone

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class BiomedCLIPModel(nn.Module):
    embed_dim: int = 512
    img_size: int = 224
    vision_dim: int = 768
    vision_depth: int = 12
    text_dim: int = 768
    text_depth: int = 12
    text_vocab: int = 30522

    def setup(self):
        heads = next(h for h in (12, 8, 4, 2, 1) if self.vision_dim % h == 0)
        self.visual = ViTBackbone(
            img_size=self.img_size, patch_size=16, dim=self.vision_dim,
            depth=self.vision_depth, num_heads=heads, use_layerscale=False,
            name="visual",
        )
        self.visual_proj = nn.Dense(self.embed_dim, use_bias=False,
                                    name="visual_proj")
        t_heads = next(h for h in (12, 8, 4, 2, 1) if self.text_dim % h == 0)
        self.text = BertTextBackbone(
            vocab_size=self.text_vocab, dim=self.text_dim,
            depth=self.text_depth, num_heads=t_heads,
            intermediate=4 * self.text_dim, name="text",
        )
        hidden = (self.text_dim + self.embed_dim) // 2
        self.text_proj1 = nn.Dense(hidden, name="text_proj1")
        self.text_proj2 = nn.Dense(self.embed_dim, name="text_proj2")
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(float(np.log(1.0 / 0.07))), (),
        )

    def encode_image(self, pixel_values, train: bool = False):
        out = self.visual(pixel_values, train)
        return self.visual_proj(out["cls"])

    def encode_text(self, input_ids, attention_mask=None):
        out = self.text(input_ids, attention_mask)
        h = self.text_proj1(out["cls"])
        h = nn.gelu(h, approximate=False)
        return self.text_proj2(h)

    def __call__(self, pixel_values, train: bool = False):
        """Registry embedder contract: L2-normalized image embedding."""
        emb = self.encode_image(pixel_values, train)
        return {"embedding": l2_normalize(emb, axis=1)}

    def init_towers(self, pixel_values, input_ids):
        """Touch both towers so init creates every parameter."""
        return self.encode_image(pixel_values), self.encode_text(input_ids)


def convert_biomedclip(sd):
    """open_clip BiomedCLIP state dict -> BiomedCLIPModel params.

    Key layout (open_clip TimmModel vision + HFTextEncoder text):
      visual.trunk.*                timm vit_base_patch16_224 (no layerscale)
      visual.head.proj.weight       linear 768 -> 512, no bias
      text.transformer.*            HF BertModel
      text.proj.0.* / text.proj.2.* MLP projection
      logit_scale
    """
    from .convert import _lin, _strip_prefixes, convert_bert, convert_vit_timm

    vit_sd = {
        k[len("visual.trunk."):]: v
        for k, v in sd.items() if k.startswith("visual.trunk.")
    }
    depth = 1 + max(
        int(k.split(".")[1]) for k in vit_sd if k.startswith("blocks.")
    )
    params = {
        "visual": convert_vit_timm(vit_sd, depth=depth, layerscale=False)["params"]
    }
    for key in ("visual.head.proj.weight", "visual.proj"):
        if key in sd:
            params["visual_proj"] = {"kernel": _lin(sd[key])}
            break
    text_sd = _strip_prefixes(
        {k: v for k, v in sd.items() if k.startswith("text.transformer.")},
        ("text.transformer.",),
    )
    t_depth = 1 + max(
        int(k.split(".")[2]) for k in text_sd if k.startswith("encoder.layer.")
    )
    params["text"] = convert_bert(text_sd, depth=t_depth)["params"]
    if "text.proj.0.weight" in sd:
        params["text_proj1"] = {
            "kernel": _lin(sd["text.proj.0.weight"]),
            "bias": sd["text.proj.0.bias"],
        }
        params["text_proj2"] = {
            "kernel": _lin(sd["text.proj.2.weight"]),
            "bias": sd["text.proj.2.bias"],
        }
    if "logit_scale" in sd:
        params["logit_scale"] = np.asarray(sd["logit_scale"]).reshape(())
    return {"params": params}
