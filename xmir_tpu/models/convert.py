"""PyTorch checkpoint -> Flax params converters.

These load the reference's pretrained weights (CheXNet DenseNet121 `model.pt`,
timm ConvNeXtV2/DINOv2/SwinV2, HF MedSigLIP/ConceptCLIP/BERT) into the
TPU-native models, which is what metric parity rests on (SURVEY.md §7
"hard parts": weight converters).

Input is a flat {name: numpy array} state dict (call `load_torch_state_dict`
on a .pt/.safetensors file). Conventions:
  conv   torch (O, I, kh, kw)  -> flax (kh, kw, I, O)
  linear torch (O, I)          -> flax (I, O)
  batchnorm weight/bias        -> params scale/bias; running stats -> batch_stats
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        # tolerate {"state_dict": ...} and the reference's buggy {"state-dict"}
        for key in ("state_dict", "state-dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w)


def _strip_prefixes(sd: Dict[str, np.ndarray], prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix):
    p = {"kernel": _lin(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


# ---------------------------------------------------------------------------
# DenseNet121 (torchvision layout; CheXNet model.pt)
# ---------------------------------------------------------------------------


def convert_densenet121(sd: Dict[str, np.ndarray]):
    """Returns {"params": ..., "batch_stats": ...} for DenseNetBackbone.

    Accepts raw torchvision (`features.*`), the reference's Sequential wrap
    (`densenet121.0.*`, model.py:53-60), and CheXNet (`densenet121.features.*`).
    """
    sd = _strip_prefixes(sd, ("densenet121.0.", "densenet121.features.", "features."))
    params, stats = {}, {}

    params["conv0"] = {"kernel": _conv(sd["conv0.weight"])}
    params["norm0"], stats["norm0"] = _bn(sd, "norm0")

    block_cfg = (6, 12, 24, 16)
    for bi, nlayers in enumerate(block_cfg):
        bname = f"denseblock{bi + 1}"
        bp, bs = {}, {}
        for li in range(nlayers):
            lname = f"denselayer{li + 1}"
            lp, ls = {}, {}
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                lp[norm], ls[norm] = _bn(sd, f"{bname}.{lname}.{norm}")
                lp[conv] = {"kernel": _conv(sd[f"{bname}.{lname}.{conv}.weight"])}
            bp[lname], bs[lname] = lp, ls
        params[bname], stats[bname] = bp, bs
        if bi < 3:
            tname = f"transition{bi + 1}"
            tp, ts = {}, {}
            tp["norm"], ts["norm"] = _bn(sd, f"{tname}.norm")
            tp["conv"] = {"kernel": _conv(sd[f"{tname}.conv.weight"])}
            params[tname], stats[tname] = tp, ts

    params["norm5"], stats["norm5"] = _bn(sd, "norm5")
    return {"params": params, "batch_stats": stats}


def convert_densenet121_embedder(sd: Dict[str, np.ndarray]):
    """Full reference DenseNet121 module (model.py:42-84): backbone + optional
    fc + optional classification_head."""
    backbone = convert_densenet121(sd)
    params = {"backbone": backbone["params"]}
    stats = {"backbone": backbone["batch_stats"]}
    if "fc.weight" in sd:
        params["fc"] = _dense(sd, "fc")
    if "classification_head.weight" in sd:
        params["classification_head"] = _dense(sd, "classification_head")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ResNet50 (torchvision layout)
# ---------------------------------------------------------------------------

_SEQ_MAP = {  # reference Sequential index -> torchvision name (model.py:13-15)
    "0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4",
}


def convert_resnet50(sd: Dict[str, np.ndarray]):
    # normalize reference Sequential keys `resnet50.N.*` to torchvision names
    norm_sd = {}
    for k, v in sd.items():
        m = re.match(r"resnet50\.(\d)\.(.*)", k)
        if m and m.group(1) in _SEQ_MAP:
            name = _SEQ_MAP[m.group(1)]
            rest = m.group(2)
            norm_sd[f"{name}.{rest}" if rest else name] = v
        elif m:
            continue  # avgpool etc.
        else:
            norm_sd[k] = v
    sd = norm_sd
    # reference Sequential stores conv1/bn1 weights directly under index
    if "conv1.weight" not in sd and "conv1" in sd:
        sd["conv1.weight"] = sd.pop("conv1")

    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    layers = (3, 4, 6, 3)
    for si, blocks in enumerate(layers):
        for b in range(blocks):
            pre = f"layer{si + 1}.{b}"
            name = f"layer{si + 1}_{b}"
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv(sd[f"{pre}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{pre}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{pre}.downsample.1")
            params[name], stats[name] = bp, bs
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# SigLIP vision tower (HF SiglipVisionModel layout)
# ---------------------------------------------------------------------------


def convert_siglip_vision(sd: Dict[str, np.ndarray], depth: int = 27):
    sd = _strip_prefixes(sd, ("vision_model.",))
    params = {}
    params["patch_embedding"] = {
        "kernel": _conv(sd["embeddings.patch_embedding.weight"]),
        "bias": sd["embeddings.patch_embedding.bias"],
    }
    params["position_embedding"] = sd["embeddings.position_embedding.weight"]
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        layer = {
            "layer_norm1": _ln(sd, f"{pre}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{pre}.layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, f"{pre}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{pre}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{pre}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{pre}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
        params[f"layer{i}"] = layer
    params["post_layernorm"] = _ln(sd, "post_layernorm")
    if "head.probe" in sd:
        dim = sd["head.probe"].shape[-1]
        in_w = sd["head.attention.in_proj_weight"]  # (3D, D)
        in_b = sd["head.attention.in_proj_bias"]
        params["head"] = {
            "probe": sd["head.probe"],
            "attn_q": {"kernel": _lin(in_w[:dim]), "bias": in_b[:dim]},
            "attn_k": {"kernel": _lin(in_w[dim : 2 * dim]), "bias": in_b[dim : 2 * dim]},
            "attn_v": {"kernel": _lin(in_w[2 * dim :]), "bias": in_b[2 * dim :]},
            "attn_out": _dense(sd, "head.attention.out_proj"),
            "layernorm": _ln(sd, "head.layernorm"),
            "mlp": {
                "fc1": _dense(sd, "head.mlp.fc1"),
                "fc2": _dense(sd, "head.mlp.fc2"),
            },
        }
    return {"params": params}


def convert_siglip_text(sd: Dict[str, np.ndarray], depth: int = 27):
    """HF SiglipTextModel -> SiglipTextBackbone params."""
    sd = _strip_prefixes(sd, ("text_model.",))
    params = {
        "token_embedding": {"embedding": sd["embeddings.token_embedding.weight"]},
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "final_layer_norm": _ln(sd, "final_layer_norm"),
        "head": _dense(sd, "head"),
    }
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "layer_norm1": _ln(sd, f"{pre}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{pre}.layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, f"{pre}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{pre}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{pre}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{pre}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# BERT text encoder (HF BertModel layout)
# ---------------------------------------------------------------------------


def convert_bert(sd: Dict[str, np.ndarray], depth: int = 12):
    sd = _strip_prefixes(sd, ("bert.",))
    params = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        },
        "embeddings_norm": _ln(sd, "embeddings.LayerNorm"),
    }
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "attention": {
                "query": _dense(sd, f"{pre}.attention.self.query"),
                "key": _dense(sd, f"{pre}.attention.self.key"),
                "value": _dense(sd, f"{pre}.attention.self.value"),
            },
            "attention_output": _dense(sd, f"{pre}.attention.output.dense"),
            "attention_norm": _ln(sd, f"{pre}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{pre}.intermediate.dense"),
            "output": _dense(sd, f"{pre}.output.dense"),
            "output_norm": _ln(sd, f"{pre}.output.LayerNorm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# ViT / DINOv2 (timm layout; also HF Dinov2Model via key remap)
# ---------------------------------------------------------------------------


def convert_vit_timm(sd: Dict[str, np.ndarray], depth: int = 12, layerscale=True):
    params = {
        "cls_token": sd["cls_token"].reshape(1, 1, -1),
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        pre = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{pre}.attn.qkv"),
                "proj": _dense(sd, f"{pre}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
        if layerscale:
            blk["ls1"] = {"gamma": sd[f"{pre}.ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[f"{pre}.ls2.gamma"]}
        params[f"block{i}"] = blk
    return {"params": params}


# ---------------------------------------------------------------------------
# ConvNeXtV2 (timm layout)
# ---------------------------------------------------------------------------


def convert_convnextv2_timm(sd: Dict[str, np.ndarray], depths=(3, 3, 27, 3)):
    params = {
        "stem_conv": {"kernel": _conv(sd["stem.0.weight"]), "bias": sd["stem.0.bias"]},
        "stem_norm": _ln(sd, "stem.1"),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"downsample{si}_norm"] = _ln(sd, f"stages.{si}.downsample.0")
            params[f"downsample{si}_conv"] = {
                "kernel": _conv(sd[f"stages.{si}.downsample.1.weight"]),
                "bias": sd[f"stages.{si}.downsample.1.bias"],
            }
        for bi in range(depth):
            pre = f"stages.{si}.blocks.{bi}"
            grn_g = sd.get(f"{pre}.mlp.grn.weight", sd.get(f"{pre}.grn.gamma"))
            grn_b = sd.get(f"{pre}.mlp.grn.bias", sd.get(f"{pre}.grn.beta"))
            params[f"stage{si}_block{bi}"] = {
                "dwconv": {
                    "kernel": _conv(sd[f"{pre}.conv_dw.weight"]),
                    "bias": sd[f"{pre}.conv_dw.bias"],
                },
                "norm": _ln(sd, f"{pre}.norm"),
                "pwconv1": _dense(sd, f"{pre}.mlp.fc1"),
                "pwconv2": _dense(sd, f"{pre}.mlp.fc2"),
                "grn": {"gamma": grn_g.reshape(-1), "beta": grn_b.reshape(-1)},
            }
    params["head_norm"] = _ln(sd, "head.norm")
    return {"params": params}


# ---------------------------------------------------------------------------
# SwinV2 (timm layout)
# ---------------------------------------------------------------------------


def convert_swinv2_timm(sd: Dict[str, np.ndarray], depths=(2, 2, 18, 2)):
    params = {
        "patch_proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "patch_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"merge{si}"] = {
                "reduction": {
                    "kernel": _lin(sd[f"layers.{si}.downsample.reduction.weight"])
                },
                "norm": _ln(sd, f"layers.{si}.downsample.norm"),
            }
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            params[f"stage{si}_block{bi}"] = {
                "attn": {
                    "qkv_kernel": _lin(sd[f"{pre}.attn.qkv.weight"]),
                    "q_bias": sd[f"{pre}.attn.q_bias"],
                    "v_bias": sd[f"{pre}.attn.v_bias"],
                    "logit_scale": sd[f"{pre}.attn.logit_scale"],
                    "cpb_fc1": {
                        "kernel": _lin(sd[f"{pre}.attn.cpb_mlp.0.weight"]),
                        "bias": sd[f"{pre}.attn.cpb_mlp.0.bias"],
                    },
                    "cpb_fc2": {"kernel": _lin(sd[f"{pre}.attn.cpb_mlp.2.weight"])},
                    "proj": _dense(sd, f"{pre}.attn.proj"),
                },
                "norm1": _ln(sd, f"{pre}.norm1"),
                "norm2": _ln(sd, f"{pre}.norm2"),
                "mlp_fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{pre}.mlp.fc2"),
            }
    return {"params": params}


# ---------------------------------------------------------------------------
# YOLOv5 detector (ultralytics v6.0 layout; ChestMIR lesion detector folds)
# ---------------------------------------------------------------------------


def _yolo_cbs(sd, prefix):
    """Conv+BN+SiLU block -> ConvBnSiLU params/batch_stats pair."""
    bn_p, bn_s = _bn(sd, f"{prefix}.bn")
    return (
        {"conv": {"kernel": _conv(sd[f"{prefix}.conv.weight"])}, "bn": bn_p},
        {"bn": bn_s},
    )


def _yolo_c3(sd, prefix, n):
    params, stats = {}, {}
    for name in ("cv1", "cv2", "cv3"):
        params[name], stats[name] = _yolo_cbs(sd, f"{prefix}.{name}")
    for j in range(n):
        bp, bs = {}, {}
        for name in ("cv1", "cv2"):
            bp[name], bs[name] = _yolo_cbs(sd, f"{prefix}.m.{j}.{name}")
        params[f"m{j}"], stats[f"m{j}"] = bp, bs
    return params, stats


def convert_yolov5(sd: Dict[str, np.ndarray], depth_multiple: float = 0.33):
    """ultralytics YOLOv5 (v6.0 graph) state_dict -> models/yolo.py variables.

    Handles the reference detector-fold lineage
    (ChestMIR/utils/inference.py:290-340 runs these as ONNX exports): keys
    ``model.{i}.*`` for layers 0..23 plus the Detect head ``model.24.m.{k}``
    and its normalized ``anchors`` buffer.

    Returns (variables, anchors_px) — anchors in pixels (the stored buffer is
    anchors/stride), ready to pass as YOLOv5(anchors=...).
    """
    sd = _strip_prefixes(sd, ("model.model.", "model."))

    def d(n):
        return max(round(n * depth_multiple), 1)

    params, stats = {}, {}
    conv_layers = (0, 1, 3, 5, 7, 10, 14, 18, 21)
    c3_layers = {2: d(3), 4: d(6), 6: d(9), 8: d(3),
                 13: d(3), 17: d(3), 20: d(3), 23: d(3)}
    for i in conv_layers:
        params[f"layer{i}"], stats[f"layer{i}"] = _yolo_cbs(sd, str(i))
    for i, n in c3_layers.items():
        params[f"layer{i}"], stats[f"layer{i}"] = _yolo_c3(sd, str(i), n)
    # SPPF (layer 9): cv1/cv2
    p9, s9 = {}, {}
    for name in ("cv1", "cv2"):
        p9[name], s9[name] = _yolo_cbs(sd, f"9.{name}")
    params["layer9"], stats["layer9"] = p9, s9
    # Detect head convs (biased)
    for k in range(3):
        params[f"detect{k}"] = {
            "kernel": _conv(sd[f"24.m.{k}.weight"]),
            "bias": sd[f"24.m.{k}.bias"],
        }
    anchors_norm = sd["24.anchors"]  # (3, na, 2), divided by stride
    strides = np.asarray([8.0, 16.0, 32.0], np.float32)
    anchors_px = anchors_norm * strides[:, None, None]
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in scale) for scale in anchors_px
    )
    return {"params": params, "batch_stats": stats}, anchors
