"""Example detector plugin for `chestmir_ingest --detector-plugin`.

A detector plugin module exposes `build_detectors() -> [callable]` — one
callable per detector fold. With `--raw-detector-outputs`, each callable
maps the letterboxed (1, 3, S, S) float32 RGB tensor in [0, 1] to a raw
YOLO head tensor (1, N, 5 + num_classes); chestmir.inference then runs the
full decode (confidence gate, class-offset NMS, letterbox unscaling, TTA
box reversal, WBF across folds x TTA).

A real deployment returns jitted Flax detector applies from a converted
checkpoint here. This example ships a content-aware stand-in that "detects"
the brightest rectangular region — enough to drive the whole two-stage
pipeline end-to-end on synthetic data:

    python -m xmir_tpu.cli.chestmir_ingest --dataset synthetic --model tiny \
        --embedding-dim 16 --detector-plugin examples.detector_plugin_example \
        --raw-detector-outputs --tta 0,4 --output chestmir_gallery.npz
"""
import numpy as np

N_CLASSES = 14  # VinDr detector classes (chestmir/lesions.py)


def _bright_region_detector(input_tensor: np.ndarray) -> np.ndarray:
    img = np.asarray(input_tensor)[0].transpose(1, 2, 0) * 255.0
    lum = img.mean(-1)
    mask = lum > (lum.mean() + lum.std())
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros((1, 1, 5 + N_CLASSES), np.float32)
    x1, x2 = xs.min(), xs.max() + 1
    y1, y2 = ys.min(), ys.max() + 1
    cls = np.full(N_CLASSES, 0.01, np.float32)
    cls[7] = 0.95  # "Lung Opacity"
    row = np.concatenate(
        [[(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.9], cls]
    )
    return np.asarray([[row]], np.float32)


def build_detectors():
    """One callable per fold (a real plugin returns 5 converted folds)."""
    return [_bright_region_detector, _bright_region_detector]
