"""Device-side (jit) image preprocessing.

The reference rebuilds torchvision Compose pipelines inline in every entry
point (train.py:928-993, test.py:1286-1332). Here preprocessing is a pure
jnp function applied to uint8 HWC batches ON DEVICE: resize + crop + flip +
jitter + normalize all fuse into the forward graph, so the host only decodes
and ships uint8 pixels (minimum PCIe/ICI bytes).

Semantics match torchvision: Resize(size) scales the SHORT side with bilinear
+ antialias; CenterCrop pads-if-needed then crops the center; normalization
uses per-model mean/std from the registry.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _resized_output_size(h: int, w: int, size: int):
    """torchvision _compute_resized_output_size: short side -> size, long
    side int(size * long / short) (Python float-division truncation)."""
    if h <= w:
        return size, max(1, int(size * w / h))
    return max(1, int(size * h / w)), size


def resize_short_side(img: jnp.ndarray, size: int, method: str = "bilinear") -> jnp.ndarray:
    """torchvision Resize(int): short side -> size, aspect preserved.
    method: 'bilinear' or 'bicubic' (timm's DINOv2 eval config)."""
    h, w = img.shape[-3], img.shape[-2]
    nh, nw = _resized_output_size(h, w, size)
    shape = img.shape[:-3] + (nh, nw, img.shape[-1])
    jax_method = {"bilinear": "bilinear", "bicubic": "cubic"}[method]
    return jax.image.resize(img, shape, jax_method, antialias=True)


def pil_resize_center_crop(arr, size: int, method: str = "bilinear"):
    """HOST-side torchvision-exact Resize(short=size)+CenterCrop(size) on a
    uint8 HWC array via PIL (torchvision's PIL backend delegates to exactly
    these PIL calls; reference eval transforms test.py:1330-1333,
    nih_multilabel_retrieval.py:48-61). Returns (size, size, 3) uint8."""
    from PIL import Image

    resample = {
        "bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
    }[method]
    img = Image.fromarray(arr)
    w, h = img.size
    nh, nw = _resized_output_size(h, w, size)
    if (nh, nw) != (h, w):
        img = img.resize((nw, nh), resample)
    # torchvision CenterCrop: int(round((n - size) / 2.)) (nearest-even)
    top = int(np.round((nh - size) / 2.0)) if nh > size else 0
    left = int(np.round((nw - size) / 2.0)) if nw > size else 0
    img = img.crop((left, top, left + size, top + size))
    out = np.asarray(img, np.uint8)
    if out.ndim == 2:
        out = np.repeat(out[..., None], 3, axis=2)
    return out


def center_crop(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[-3], img.shape[-2]
    pad_h, pad_w = max(0, size - h), max(0, size - w)
    if pad_h or pad_w:
        pads = [(0, 0)] * (img.ndim - 3) + [
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ]
        img = jnp.pad(img, pads)
        h, w = img.shape[-3], img.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(img, top, top + size, axis=-3), left, left + size, axis=-2
    )


def normalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


@functools.partial(
    jax.jit, static_argnames=("resize_size", "crop_size", "mean", "std", "method")
)
def eval_preprocess(batch_u8, resize_size: int, crop_size: int, mean, std,
                    method: str = "bilinear"):
    """Validation pipeline: Resize(short) -> CenterCrop -> Normalize.
    batch_u8: (B, H, W, 3) uint8 (uniform decoded size per batch)."""
    x = resize_short_side(batch_u8.astype(jnp.float32), resize_size, method)
    x = center_crop(x, crop_size)
    return normalize(x, mean, std)


@functools.partial(
    jax.jit,
    static_argnames=(
        "resize_size", "crop_size", "mean", "std", "rand_resize", "jitter",
        "method",
    ),
)
def train_preprocess(
    rng,
    batch_u8,
    resize_size: int,
    crop_size: int,
    mean,
    std,
    rand_resize: bool = False,
    jitter: bool = True,
    method: str = "bilinear",
):
    """Training pipeline (reference train.py:952-983): Resize -> (RandomCrop
    pad4 | CenterCrop) -> RandomHorizontalFlip -> ColorJitter(0.1, 0.1) ->
    Normalize, vectorized over the batch with per-sample RNG."""
    b = batch_u8.shape[0]
    x = resize_short_side(batch_u8.astype(jnp.float32), resize_size, method)
    k_crop, k_flip, k_bright, k_contrast = jax.random.split(rng, 4)

    if rand_resize:
        x = jnp.pad(x, [(0, 0), (4, 4), (4, 4), (0, 0)], mode="constant")
        h, w = x.shape[1], x.shape[2]
        tops = jax.random.randint(k_crop, (b,), 0, h - crop_size + 1)
        lefts = jax.random.randint(k_crop, (b,), 0, w - crop_size + 1)

        def crop_one(img, top, left):
            return jax.lax.dynamic_slice(
                img, (top, left, 0), (crop_size, crop_size, img.shape[-1])
            )

        x = jax.vmap(crop_one)(x, tops, lefts)
    else:
        x = center_crop(x, crop_size)

    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    if jitter:
        brightness = jax.random.uniform(k_bright, (b,), minval=0.9, maxval=1.1)
        contrast = jax.random.uniform(k_contrast, (b,), minval=0.9, maxval=1.1)
        x = x * brightness[:, None, None, None]
        gray_mean = jnp.mean(
            x @ jnp.asarray([0.299, 0.587, 0.114]), axis=(1, 2), keepdims=True
        )[..., None]
        x = (x - gray_mean) * contrast[:, None, None, None] + gray_mean
        x = jnp.clip(x, 0.0, 255.0)

    return normalize(x, mean, std)


def preprocess_for_spec(batch_u8, spec, train: bool = False, rng=None, rand_resize=False):
    """Apply the registry ModelSpec's transform (sizes + normalization +
    interpolation)."""
    method = getattr(spec, "interpolation", "bilinear")
    if train:
        if rng is None:
            raise ValueError("train preprocessing needs an rng key")
        return train_preprocess(
            rng, batch_u8, spec.resize_size, spec.input_size, spec.mean, spec.std,
            rand_resize=rand_resize, method=method,
        )
    return eval_preprocess(
        batch_u8, spec.resize_size, spec.input_size, spec.mean, spec.std,
        method=method,
    )
