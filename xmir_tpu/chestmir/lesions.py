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
