"""ChestMIR lesion vocabulary + canonicalization
(reference ChestMIR/chestmir_eval.py:45-121, utils/inference.py:67-82)."""
from __future__ import annotations

from typing import Dict, List

VINDR_DETECTOR_CLASSES = [
    "Aortic enlargement", "Atelectasis", "Calcification", "Cardiomegaly",
    "Consolidation", "ILD", "Infiltration", "Lung Opacity", "Nodule/Mass",
    "Other lesion", "Pleural effusion", "Pleural thickening", "Pneumothorax",
    "Pulmonary fibrosis",
]

LESION_ALIAS_GROUPS = {
    "consolidation": ["consolidation"],
    "lung opacity": ["lung opacity", "lung_opacity", "opacity", "opacities"],
    "infiltration": ["infiltration", "infiltrate", "infiltrates"],
    "atelectasis": ["atelectasis", "atelectatic"],
    "pleural effusion": [
        "pleural effusion", "pleural_effusion", "effusion", "plural effusion",
    ],
    "nodule mass": ["nodule mass", "nodule/mass", "nodule_mass", "mass", "nodule"],
    "cardiomegaly": ["cardiomegaly"],
    "edema": ["edema"],
    "pneumothorax": ["pneumothorax"],
    "pleural thickening": ["pleural thickening", "pleural_thickening"],
    "pulmonary fibrosis": ["pulmonary fibrosis", "pulmonary_fibrosis", "fibrosis"],
    "enlarged pa": ["enlarged pa", "enlarged_pa"],
    "ild": ["ild", "interstitial lung disease"],
    "calcification": ["calcification"],
    "lung cavity": ["lung cavity", "lung_cavity", "cavity"],
    "lung cyst": ["lung cyst", "lung_cyst", "cyst"],
    "aortic enlargement": ["aortic enlargement", "aortic_enlargement"],
    "other lesion": ["other lesion", "other_lesion"],
}

LESION_ALIAS_TO_CANON: Dict[str, str] = {}
for _canon, _aliases in LESION_ALIAS_GROUPS.items():
    for _alias in _aliases:
        LESION_ALIAS_TO_CANON[_alias] = _canon


def canonical_lesion_name(name: str) -> str:
    key = str(name).strip().lower().replace("-", " ")
    return LESION_ALIAS_TO_CANON.get(key, key)


def detector_fn_from_checkpoint(
    path: str,
    num_classes: int = 14,
    depth_multiple: float = 0.33,
    width_multiple: float = 0.50,
):
    """Build a ``detector_fn`` (letterboxed (1, 3, S, S) float32 -> raw
    (1, N, 5+nc) predictions) from an ultralytics-layout YOLOv5 ``.pt``
    checkpoint via the native Flax tower — the real-checkpoint replacement
    for the reference's ONNX sessions (ChestMIR/utils/inference.py:290-340).

    One fn per fold; pass the list to ``inference.predict_image``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.convert import convert_yolov5, load_torch_state_dict
    from ..models.yolo import YOLOv5

    sd = load_torch_state_dict(path)
    variables, anchors = convert_yolov5(sd, depth_multiple=depth_multiple)
    model = YOLOv5(
        num_classes=num_classes, depth_multiple=depth_multiple,
        width_multiple=width_multiple, anchors=anchors,
    )

    @jax.jit
    def _apply(x_nhwc):
        return model.apply(variables, x_nhwc, train=False)["prediction"]

    def detector_fn(input_tensor: "np.ndarray") -> "np.ndarray":
        x = jnp.asarray(np.transpose(np.asarray(input_tensor), (0, 2, 3, 1)))
        return np.asarray(_apply(x))

    return detector_fn
