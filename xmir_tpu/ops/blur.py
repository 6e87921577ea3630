"""Gaussian blur substrate for insertion metrics (reference evaluation.py:11-24
gkern: dirac -> scipy gaussian_filter, klen=51, sigma=sqrt(50))."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def gkern(klen: int = 51, nsig: float = 50**0.5) -> np.ndarray:
    from scipy.ndimage import gaussian_filter

    inp = np.zeros((klen, klen), np.float32)
    inp[klen // 2, klen // 2] = 1.0
    k = gaussian_filter(inp, nsig).astype(np.float32)
    return k


@functools.partial(jax.jit, static_argnames=("klen", "nsig"))
def gaussian_blur(images: jnp.ndarray, klen: int = 51, nsig: float = 50**0.5):
    """Depthwise gaussian blur on (B, H, W, C), SAME padding — matches the
    reference's conv2d(images, gkern, padding=klen//2)."""
    k = jnp.asarray(gkern(klen, nsig))
    c = images.shape[-1]
    kernel = jnp.zeros((klen, klen, 1, c), jnp.float32)
    for ch in range(c):
        kernel = kernel.at[:, :, 0, ch].set(k)
    return jax.lax.conv_general_dilated(
        images.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
