from .registry import ModelSpec, create_model, get_spec, list_models
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
from .densenet import DenseNetBackbone, densenet121
from .resnet import ResNetBackbone, resnet50
from .convnext import ConvNeXtV2Backbone, convnextv2_base, convnextv2_tiny
from .vit import ViTBackbone, vit_base_patch14_dinov2
from .siglip import SiglipVisionBackbone, medsiglip_448_vision
from .swin import SwinV2Backbone, swinv2_base_window12to24_192to384
from .bert import BertTextBackbone, pubmedbert_base
from .ath import ATHNet
from .biomedclip import BiomedCLIPModel, convert_biomedclip
from .siglip_text import (
    COVIDX_LABEL_TO_TEXT,
    MedSigLIPDualEncoder,
    SiglipTextBackbone,
)
