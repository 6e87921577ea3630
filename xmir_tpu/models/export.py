"""Flax -> torch-layout checkpoint export.

The reference ships ONNX converters (convert_to_onnx.py, ChestMIR/utils/
convert_onnx.py) so other tooling can consume its models. The TPU-native
interchange format here is the reverse weight mapping: export trained Flax
params back into torchvision-naming flat state dicts (npz / torch .pt), so
the reference's own eval scripts — or any torch/ONNX pipeline — can load
xmir_tpu-trained weights.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_to_torch(k):  # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _lin_to_torch(k):  # (I, O) -> (O, I)
    return np.transpose(np.asarray(k))


def export_densenet121_backbone(params: Dict, batch_stats: Dict,
                                prefix: str = "features.") -> Dict[str, np.ndarray]:
    """DenseNetBackbone -> torchvision densenet121 `features.*` state dict
    (exact inverse of convert.convert_densenet121)."""
    sd = {}

    def bn(name, p, s):
        sd[f"{prefix}{name}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}{name}.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}{name}.running_mean"] = np.asarray(s["mean"])
        sd[f"{prefix}{name}.running_var"] = np.asarray(s["var"])

    sd[f"{prefix}conv0.weight"] = _conv_to_torch(params["conv0"]["kernel"])
    bn("norm0", params["norm0"], batch_stats["norm0"])
    for bi, nlayers in enumerate((6, 12, 24, 16)):
        bname = f"denseblock{bi + 1}"
        for li in range(nlayers):
            lname = f"denselayer{li + 1}"
            lp = params[bname][lname]
            ls = batch_stats[bname][lname]
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                bn(f"{bname}.{lname}.{norm}", lp[norm], ls[norm])
                sd[f"{prefix}{bname}.{lname}.{conv}.weight"] = _conv_to_torch(
                    lp[conv]["kernel"]
                )
        if bi < 3:
            tname = f"transition{bi + 1}"
            bn(f"{tname}.norm", params[tname]["norm"], batch_stats[tname]["norm"])
            sd[f"{prefix}{tname}.conv.weight"] = _conv_to_torch(
                params[tname]["conv"]["kernel"]
            )
    bn("norm5", params["norm5"], batch_stats["norm5"])
    return sd


def export_densenet121_embedder(variables: Dict) -> Dict[str, np.ndarray]:
    """DenseNet121Embedder -> reference DenseNet121 module state dict
    (`densenet121.0.*` Sequential naming, model.py:53-63, + fc/head)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = export_densenet121_backbone(
        params["backbone"], stats.get("backbone", {}), prefix="densenet121.0."
    )
    if "fc" in params:
        sd["fc.weight"] = _lin_to_torch(params["fc"]["kernel"])
        if "bias" in params["fc"]:
            sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    if "classification_head" in params:
        sd["classification_head.weight"] = _lin_to_torch(
            params["classification_head"]["kernel"]
        )
        sd["classification_head.bias"] = np.asarray(
            params["classification_head"]["bias"]
        )
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str):
    """Save as a torch .pt (if torch importable) or .npz fallback."""
    if path.endswith((".pt", ".pth")):
        import torch

        torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    else:
        np.savez(path, **sd)
    return path


def _bn_to_torch(sd, prefix, p, s):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    sd[f"{prefix}.running_var"] = np.asarray(s["var"])


def _ln_to_torch(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _dense_to_torch(sd, prefix, p):
    sd[f"{prefix}.weight"] = _lin_to_torch(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def export_resnet50_backbone(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """ResNetBackbone -> torchvision resnet50 state dict (exact inverse of
    convert.convert_resnet50)."""
    sd = {}
    sd["conv1.weight"] = _conv_to_torch(params["conv1"]["kernel"])
    _bn_to_torch(sd, "bn1", params["bn1"], batch_stats["bn1"])
    for si, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            pre = f"layer{si + 1}.{b}"
            name = f"layer{si + 1}_{b}"
            bp, bs = params[name], batch_stats[name]
            for ci in (1, 2, 3):
                sd[f"{pre}.conv{ci}.weight"] = _conv_to_torch(bp[f"conv{ci}"]["kernel"])
                _bn_to_torch(sd, f"{pre}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                sd[f"{pre}.downsample.0.weight"] = _conv_to_torch(
                    bp["downsample_conv"]["kernel"]
                )
                _bn_to_torch(sd, f"{pre}.downsample.1", bp["downsample_bn"],
                             bs["downsample_bn"])
    return sd


def export_siglip_vision(params: Dict, depth: int = 27) -> Dict[str, np.ndarray]:
    """SiglipVisionBackbone -> HF SiglipVisionModel state dict (inverse of
    convert.convert_siglip_vision)."""
    sd = {}
    sd["embeddings.patch_embedding.weight"] = _conv_to_torch(
        params["patch_embedding"]["kernel"]
    )
    sd["embeddings.patch_embedding.bias"] = np.asarray(
        params["patch_embedding"]["bias"]
    )
    sd["embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]
    )
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        layer = params[f"layer{i}"]
        _ln_to_torch(sd, f"{pre}.layer_norm1", layer["layer_norm1"])
        _ln_to_torch(sd, f"{pre}.layer_norm2", layer["layer_norm2"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _dense_to_torch(sd, f"{pre}.self_attn.{proj}", layer["self_attn"][proj])
        _dense_to_torch(sd, f"{pre}.mlp.fc1", layer["mlp"]["fc1"])
        _dense_to_torch(sd, f"{pre}.mlp.fc2", layer["mlp"]["fc2"])
    _ln_to_torch(sd, "post_layernorm", params["post_layernorm"])
    if "head" in params:
        head = params["head"]
        sd["head.probe"] = np.asarray(head["probe"])
        sd["head.attention.in_proj_weight"] = np.concatenate([
            _lin_to_torch(head["attn_q"]["kernel"]),
            _lin_to_torch(head["attn_k"]["kernel"]),
            _lin_to_torch(head["attn_v"]["kernel"]),
        ])
        sd["head.attention.in_proj_bias"] = np.concatenate([
            np.asarray(head["attn_q"]["bias"]),
            np.asarray(head["attn_k"]["bias"]),
            np.asarray(head["attn_v"]["bias"]),
        ])
        _dense_to_torch(sd, "head.attention.out_proj", head["attn_out"])
        _ln_to_torch(sd, "head.layernorm", head["layernorm"])
        _dense_to_torch(sd, "head.mlp.fc1", head["mlp"]["fc1"])
        _dense_to_torch(sd, "head.mlp.fc2", head["mlp"]["fc2"])
    return sd


def export_siglip_text(params: Dict, depth: int = 27) -> Dict[str, np.ndarray]:
    """SiglipTextBackbone -> HF SiglipTextModel state dict."""
    sd = {
        "embeddings.token_embedding.weight": np.asarray(
            params["token_embedding"]["embedding"]
        ),
        "embeddings.position_embedding.weight": np.asarray(
            params["position_embedding"]
        ),
    }
    _ln_to_torch(sd, "final_layer_norm", params["final_layer_norm"])
    _dense_to_torch(sd, "head", params["head"])
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        layer = params[f"layer{i}"]
        _ln_to_torch(sd, f"{pre}.layer_norm1", layer["layer_norm1"])
        _ln_to_torch(sd, f"{pre}.layer_norm2", layer["layer_norm2"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _dense_to_torch(sd, f"{pre}.self_attn.{proj}", layer["self_attn"][proj])
        _dense_to_torch(sd, f"{pre}.mlp.fc1", layer["mlp"]["fc1"])
        _dense_to_torch(sd, f"{pre}.mlp.fc2", layer["mlp"]["fc2"])
    return sd


def export_bert(params: Dict, depth: int = 12) -> Dict[str, np.ndarray]:
    """BertTextBackbone -> HF BertModel state dict."""
    sd = {
        "embeddings.word_embeddings.weight": np.asarray(
            params["word_embeddings"]["embedding"]
        ),
        "embeddings.position_embeddings.weight": np.asarray(
            params["position_embeddings"]["embedding"]
        ),
        "embeddings.token_type_embeddings.weight": np.asarray(
            params["token_type_embeddings"]["embedding"]
        ),
    }
    _ln_to_torch(sd, "embeddings.LayerNorm", params["embeddings_norm"])
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        layer = params[f"layer{i}"]
        for name, key in (("query", "query"), ("key", "key"), ("value", "value")):
            _dense_to_torch(sd, f"{pre}.attention.self.{name}",
                            layer["attention"][key])
        _dense_to_torch(sd, f"{pre}.attention.output.dense",
                        layer["attention_output"])
        _ln_to_torch(sd, f"{pre}.attention.output.LayerNorm",
                     layer["attention_norm"])
        _dense_to_torch(sd, f"{pre}.intermediate.dense", layer["intermediate"])
        _dense_to_torch(sd, f"{pre}.output.dense", layer["output"])
        _ln_to_torch(sd, f"{pre}.output.LayerNorm", layer["output_norm"])
    return sd


def export_vit_timm(params: Dict, depth: int = 12,
                    layerscale: bool = True) -> Dict[str, np.ndarray]:
    """ViTBackbone -> timm DINOv2 ViT state dict."""
    sd = {
        "cls_token": np.asarray(params["cls_token"]),
        "pos_embed": np.asarray(params["pos_embed"]),
        "patch_embed.proj.weight": _conv_to_torch(params["patch_embed"]["kernel"]),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["bias"]),
    }
    _ln_to_torch(sd, "norm", params["norm"])
    for i in range(depth):
        pre = f"blocks.{i}"
        blk = params[f"block{i}"]
        _ln_to_torch(sd, f"{pre}.norm1", blk["norm1"])
        _ln_to_torch(sd, f"{pre}.norm2", blk["norm2"])
        _dense_to_torch(sd, f"{pre}.attn.qkv", blk["attn"]["qkv"])
        _dense_to_torch(sd, f"{pre}.attn.proj", blk["attn"]["proj"])
        _dense_to_torch(sd, f"{pre}.mlp.fc1", blk["mlp"]["fc1"])
        _dense_to_torch(sd, f"{pre}.mlp.fc2", blk["mlp"]["fc2"])
        if layerscale:
            sd[f"{pre}.ls1.gamma"] = np.asarray(blk["ls1"]["gamma"])
            sd[f"{pre}.ls2.gamma"] = np.asarray(blk["ls2"]["gamma"])
    return sd


def export_convnextv2_timm(params: Dict,
                           depths=(3, 3, 27, 3)) -> Dict[str, np.ndarray]:
    """ConvNeXtV2Backbone -> timm convnextv2 state dict."""
    sd = {
        "stem.0.weight": _conv_to_torch(params["stem_conv"]["kernel"]),
        "stem.0.bias": np.asarray(params["stem_conv"]["bias"]),
    }
    _ln_to_torch(sd, "stem.1", params["stem_norm"])
    for si, depth in enumerate(depths):
        if si > 0:
            _ln_to_torch(sd, f"stages.{si}.downsample.0",
                         params[f"downsample{si}_norm"])
            sd[f"stages.{si}.downsample.1.weight"] = _conv_to_torch(
                params[f"downsample{si}_conv"]["kernel"]
            )
            sd[f"stages.{si}.downsample.1.bias"] = np.asarray(
                params[f"downsample{si}_conv"]["bias"]
            )
        for bi in range(depth):
            pre = f"stages.{si}.blocks.{bi}"
            blk = params[f"stage{si}_block{bi}"]
            sd[f"{pre}.conv_dw.weight"] = _conv_to_torch(blk["dwconv"]["kernel"])
            sd[f"{pre}.conv_dw.bias"] = np.asarray(blk["dwconv"]["bias"])
            _ln_to_torch(sd, f"{pre}.norm", blk["norm"])
            _dense_to_torch(sd, f"{pre}.mlp.fc1", blk["pwconv1"])
            _dense_to_torch(sd, f"{pre}.mlp.fc2", blk["pwconv2"])
            sd[f"{pre}.mlp.grn.weight"] = np.asarray(blk["grn"]["gamma"]).reshape(-1)
            sd[f"{pre}.mlp.grn.bias"] = np.asarray(blk["grn"]["beta"]).reshape(-1)
    _ln_to_torch(sd, "head.norm", params["head_norm"])
    return sd


def export_swinv2_timm(params: Dict,
                       depths=(2, 2, 18, 2)) -> Dict[str, np.ndarray]:
    """SwinV2Backbone -> timm swinv2 state dict."""
    sd = {
        "patch_embed.proj.weight": _conv_to_torch(params["patch_proj"]["kernel"]),
        "patch_embed.proj.bias": np.asarray(params["patch_proj"]["bias"]),
    }
    _ln_to_torch(sd, "patch_embed.norm", params["patch_norm"])
    _ln_to_torch(sd, "norm", params["norm"])
    for si, depth in enumerate(depths):
        if si > 0:
            sd[f"layers.{si}.downsample.reduction.weight"] = _lin_to_torch(
                params[f"merge{si}"]["reduction"]["kernel"]
            )
            _ln_to_torch(sd, f"layers.{si}.downsample.norm",
                         params[f"merge{si}"]["norm"])
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            blk = params[f"stage{si}_block{bi}"]
            attn = blk["attn"]
            sd[f"{pre}.attn.qkv.weight"] = _lin_to_torch(attn["qkv_kernel"])
            sd[f"{pre}.attn.q_bias"] = np.asarray(attn["q_bias"])
            sd[f"{pre}.attn.v_bias"] = np.asarray(attn["v_bias"])
            sd[f"{pre}.attn.logit_scale"] = np.asarray(attn["logit_scale"])
            sd[f"{pre}.attn.cpb_mlp.0.weight"] = _lin_to_torch(
                attn["cpb_fc1"]["kernel"]
            )
            sd[f"{pre}.attn.cpb_mlp.0.bias"] = np.asarray(attn["cpb_fc1"]["bias"])
            sd[f"{pre}.attn.cpb_mlp.2.weight"] = _lin_to_torch(
                attn["cpb_fc2"]["kernel"]
            )
            _dense_to_torch(sd, f"{pre}.attn.proj", attn["proj"])
            _ln_to_torch(sd, f"{pre}.norm1", blk["norm1"])
            _ln_to_torch(sd, f"{pre}.norm2", blk["norm2"])
            _dense_to_torch(sd, f"{pre}.mlp.fc1", blk["mlp_fc1"])
            _dense_to_torch(sd, f"{pre}.mlp.fc2", blk["mlp_fc2"])
    return sd


def export_backbone(name: str, variables: Dict, **kwargs) -> Dict[str, np.ndarray]:
    """Export any registry backbone's params back to its source framework's
    state-dict layout (the inverse of models/convert.py — round-trip tested
    per backbone in tests/test_export.py). `variables` is the embedder's
    variable dict; the backbone subtree is resolved per model."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if name == "densenet121":
        return export_densenet121_embedder(variables)
    if name == "resnet50":
        return export_resnet50_backbone(
            params["backbone"], stats.get("backbone", {})
        )
    if name in ("convnextv2", "convnextv2_sra", "convnextv2_pcam"):
        return export_convnextv2_timm(params["backbone"], **kwargs)
    if name == "swinv2":
        return export_swinv2_timm(params["backbone"], **kwargs)
    if name == "dinov2":
        return export_vit_timm(params["backbone"], **kwargs)
    if name == "medsiglip":
        return export_siglip_vision(params["backbone"], **kwargs)
    if name == "conceptclip":
        sd = {
            f"visual.{k}": v
            for k, v in export_siglip_vision(params["visual"], **kwargs).items()
        }
        sd.update(
            {f"text.{k}": v for k, v in export_bert(params["text"]).items()}
        )
        return sd
    raise ValueError(f"no exporter for {name!r}")


def export_savedmodel(model, variables: Dict, path: str, input_shape,
                      dtype="float32"):
    """Serving-format export via jax2tf -> TF SavedModel (the reference's
    ONNX-export role, convert_to_onnx.py:1-26: hand the trained model to
    non-JAX inference tooling; tf2onnx converts SavedModels onward to ONNX
    where needed). The exported function maps an input batch to the
    L2-normalized embedding."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    def embed(x):
        out = model.apply(variables, x, train=False)
        return out["embedding"] if isinstance(out, dict) else out

    poly = ["(b, ...)"] if input_shape[0] is None else None
    converted = jax2tf.convert(
        embed, with_gradient=False, polymorphic_shapes=poly
    )
    module = tf.Module()
    module.embed = tf.function(
        converted,
        autograph=False,
        input_signature=[tf.TensorSpec(input_shape, dtype)],
    )
    tf.saved_model.save(module, path)
    return path
