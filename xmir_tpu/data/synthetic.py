"""Synthetic datasets for tests, smoke evals, and benchmarks (the rebuild's
equivalent of the reference's quick-subset smoke evals,
test_eval_conceptclip.py:30-31)."""
from __future__ import annotations

import os

import numpy as np


class SyntheticImageDataset:
    """Class-conditioned random images: each class gets a distinct mean color
    + frequency pattern so even random-init embedders separate them weakly and
    trained ones strongly."""

    def __init__(self, n: int = 64, size: int = 64, num_classes: int = 3,
                 seed: int = 0, hard: bool = False):
        rng = np.random.default_rng(seed)
        self.labels = (np.arange(n) % num_classes).tolist()
        rng.shuffle(self.labels)
        self.size = size
        self.num_classes = num_classes
        self._seed = seed
        self.hard = hard
        self.image_names = [f"synthetic_{i:04d}.png" for i in range(n)]

    def __len__(self):
        return len(self.labels)

    def load_image(self, index: int) -> np.ndarray:
        rng = np.random.default_rng(self._seed * 100_003 + index)
        label = self.labels[index]
        s = self.size
        base = np.zeros((s, s, 3), np.float32)
        yy, xx = np.mgrid[0:s, 0:s]
        if self.hard:
            # learning-curve mode: all classes share the same gray base;
            # only a low-amplitude frequency pattern under heavy noise
            # separates them, so random-init embedders score near chance
            # and the demo/CI artifact shows mAP IMPROVING across epochs
            base[...] = 110.0
            pattern = 25 * np.sin(2 * np.pi * (label + 1) * xx / s) * np.cos(
                2 * np.pi * (label + 1) * yy / s
            )
            noise = rng.normal(0, 20, (s, s, 3))
        else:
            base[..., label % 3] = 120 + 40 * (label // 3)
            pattern = 40 * np.sin(2 * np.pi * (label + 1) * xx / s) * np.cos(
                2 * np.pi * (label + 1) * yy / s
            )
            noise = rng.normal(0, 20, (s, s, 3))
        img = np.clip(base + pattern[..., None] + noise + 60, 0, 255)
        return img.astype(np.uint8)


class SyntheticMultiLabelDataset(SyntheticImageDataset):
    """Multi-hot synthetic dataset: each image activates 1-3 of `num_labels`
    pathologies, each contributing a distinct visual pattern — for NIH-style
    dual-head and Jaccard-loss smoke training."""

    def __init__(self, n: int = 64, size: int = 64, num_labels: int = 6,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        super().__init__(n=n, size=size, num_classes=num_labels, seed=seed)
        labels = np.zeros((n, num_labels), np.float32)
        for i in range(n):
            k = rng.integers(1, 4)
            labels[i, rng.choice(num_labels, size=k, replace=False)] = 1.0
        self.labels = labels
        self.num_labels = num_labels

    def load_image(self, index: int) -> np.ndarray:
        rng = np.random.default_rng(self._seed * 100_003 + index)
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s]
        img = np.full((s, s, 3), 40.0, np.float32)
        for li in np.nonzero(self.labels[index])[0]:
            pattern = 50 * np.sin(2 * np.pi * (li + 2) * xx / s + li)
            img[..., li % 3] += pattern
        img += rng.normal(0, 15, (s, s, 3))
        return np.clip(img + 60, 0, 255).astype(np.uint8)


def write_synthetic_covidx(root: str, n: int = 30, size: int = 48, seed: int = 0,
                           hard: bool = False):
    """Materialize a tiny on-disk COVIDx-format dataset (txt manifest
    `idx filename label`) for end-to-end CLI tests."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    ds = SyntheticImageDataset(n=n, size=size, num_classes=3, seed=seed, hard=hard)
    names = list(COVIDX_CLASS_NAMES)
    manifest = os.path.join(root, "manifest.txt")
    with open(manifest, "w") as f:
        for i in range(n):
            fname = f"img_{i:04d}.png"
            Image.fromarray(ds.load_image(i)).save(
                os.path.join(root, "images", fname)
            )
            f.write(f"{i} {fname} {names[ds.labels[i]]}\n")
    return os.path.join(root, "images"), manifest


COVIDX_CLASS_NAMES = ("normal", "pneumonia", "COVID-19")
