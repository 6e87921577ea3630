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
