"""Model registry: one dataclass spec per backbone, replacing the reference's
inline model-name -> image-size/normalization tables duplicated across ~20
entry points (e.g. test.py:1286-1332, milvus/milvus_setup.py:19-74,
nih_multilabel_retrieval.py:19-69)."""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
RAD_DINO_MEAN = (0.5307, 0.5307, 0.5307)
RAD_DINO_STD = (0.2583, 0.2583, 0.2583)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    builder: Callable
    input_size: int
    resize_size: int  # val-transform resize before center crop
    embed_dim: int  # default embedding dim (no fc override)
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    kwargs: tuple = ()  # default builder kwargs as sorted (k, v) pairs
    # resize interpolation; timm's DINOv2 eval config uses bicubic, every
    # other reference transform torchvision-default bilinear
    interpolation: str = "bilinear"


def _specs():
    from .embedders import (
        ATHEmbedder,
        ConceptCLIPModel,
        ConvNeXtV2Embedder,
        ConvNeXtV2PCAMEmbedder,
        ConvNeXtV2SRAEmbedder,
        DenseNet121Embedder,
        DinoV2Embedder,
        DistillEmbedder,
        MedSigLIPEmbedder,
        NIHDualHeadModel,
        ResNet50Embedder,
        SwinV2Embedder,
        TinyEmbedder,
    )
    from .biomedclip import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, BiomedCLIPModel

    # resize/crop sizes follow reference transforms (train.py:928-993,
    # test.py:1286-1332, milvus/milvus_retrieval.py:143-200)
    return {
        "densenet121": ModelSpec("densenet121", DenseNet121Embedder, 224, 256, 1024),
        "resnet50": ModelSpec("resnet50", ResNet50Embedder, 224, 256, 2048),
        "convnextv2": ModelSpec("convnextv2", ConvNeXtV2Embedder, 384, 432, 1024),
        "convnextv2_sra": ModelSpec(
            "convnextv2_sra", ConvNeXtV2SRAEmbedder, 384, 432, 1024
        ),
        "convnextv2_pcam": ModelSpec(
            "convnextv2_pcam", ConvNeXtV2PCAMEmbedder, 384, 432, 1024
        ),
        "convnextv2_dino_distill": ModelSpec(
            "convnextv2_dino_distill", DistillEmbedder, 384, 432, 1024
        ),
        "convnextv2_raddino_distill": ModelSpec(
            "convnextv2_raddino_distill",
            DistillEmbedder,
            384,
            432,
            1024,
            kwargs=(("rad_dino_norm", True),),
        ),
        "swinv2": ModelSpec("swinv2", SwinV2Embedder, 384, 432, 1024),
        "dinov2": ModelSpec(
            "dinov2", DinoV2Embedder, 518, 518, 768, interpolation="bicubic"
        ),
        "medsiglip": ModelSpec(
            "medsiglip", MedSigLIPEmbedder, 448, 512, 512, SIGLIP_MEAN, SIGLIP_STD
        ),
        "conceptclip": ModelSpec(
            "conceptclip", ConceptCLIPModel, 384, 432, 1152, SIGLIP_MEAN, SIGLIP_STD
        ),
        "nih_dinov2": ModelSpec(
            "nih_dinov2",
            NIHDualHeadModel,
            518,
            518,
            256,
            kwargs=(("backbone", "dinov2"),),
        ),
        "nih_convnextv2": ModelSpec(
            "nih_convnextv2",
            NIHDualHeadModel,
            384,
            432,
            256,
            kwargs=(("backbone", "convnextv2"),),
        ),
        "ath": ModelSpec("ath", ATHEmbedder, 256, 256, 48),
        # debug-only backbone (not in the reference): compiles in seconds,
        # for CLI smoke tests / quick experiments
        "tiny": ModelSpec("tiny", TinyEmbedder, 64, 64, 64),
        # open_clip BiomedCLIP tower (reference test.py:1218-1240): CLIP
        # normalization, 224px
        "biomedclip": ModelSpec(
            "biomedclip", BiomedCLIPModel, 224, 224, 512,
            mean=OPENAI_CLIP_MEAN, std=OPENAI_CLIP_STD,
        ),
    }


_SPEC_CACHE: Optional[dict] = None


def get_spec(name: str) -> ModelSpec:
    global _SPEC_CACHE
    if _SPEC_CACHE is None:
        _SPEC_CACHE = _specs()
    try:
        return _SPEC_CACHE[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; options: {sorted(_SPEC_CACHE)}")


def list_models():
    global _SPEC_CACHE
    if _SPEC_CACHE is None:
        _SPEC_CACHE = _specs()
    return sorted(_SPEC_CACHE)


def create_model(name: str, **overrides):
    """Instantiate a model by registry name, mirroring the reference's
    model-select blocks (train.py:723-765, test.py:1144-1267)."""
    spec = get_spec(name)
    kwargs = dict(spec.kwargs)
    kwargs.update(overrides)
    return spec.builder(**kwargs), spec
