"""SBSM similarity-based saliency (occlusion) — vmapped/chunked TPU version.

Reference explanations.py:15-152 (SBSM / SBSMBatch): sliding-window binary
masks occlude the retrieved image; saliency accumulates the distance increase
(m_dist - o_dist)+ at occluded pixels, normalized by per-pixel coverage.
The reference fans mask batches across GPUs with DataParallel
(README.md:76, compute_saliency.py:67); here the mask stack is a constant
tensor streamed through `lax.map` chunks of a jitted embed function on one
device; `sbsm_self_saliency_mesh` / `sbsm_pair_saliency_mesh` shard the MASK
axis over the mesh `data` axis with shard_map — each device embeds its own
mask shard and the per-pixel accumulation is one psum (the TPU-native form
of the reference's DataParallel mask fan-out).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def generate_masks(input_size, window_size: int = 24, stride: int = 5) -> np.ndarray:
    """Sliding-window binary masks (N, H, W) uint8 — 0 inside the window
    (reference explanations.py:22-68; same grid: starts at stride-window)."""
    h, w = (input_size, input_size) if np.isscalar(input_size) else input_size
    rows = np.arange(0 + stride - window_size, h, stride)
    cols = np.arange(0 + stride - window_size, w, stride)
    masks = np.ones((len(rows) * len(cols), h, w), dtype=np.uint8)
    i = 0
    for r in rows:
        for c in cols:
            r1, r2 = max(r, 0), min(r + window_size, h)
            c1, c2 = max(c, 0), min(c + window_size, w)
            masks[i, r1:r2, c1:c2] = 0
            i += 1
    return masks


def _masked_embeds(embed_fn, variables, image, masks, chunk: int):
    """Embed image ⊙ mask for every mask, chunked to bound memory.
    image (H, W, C), masks (N, H, W) -> (N, D)."""
    n = masks.shape[0]
    pad = (-n) % chunk
    masks_p = jnp.concatenate(
        [masks, jnp.ones((pad,) + masks.shape[1:], masks.dtype)], axis=0
    ) if pad else masks
    m_chunks = masks_p.reshape(-1, chunk, *masks.shape[1:])

    def one_chunk(mc):
        stack = mc[..., None].astype(image.dtype) * image[None]
        return embed_fn(variables, stack)

    embeds = jax.lax.map(one_chunk, m_chunks)
    return embeds.reshape(-1, embeds.shape[-1])[:n]


def _cdist(a, b):
    sq_a = jnp.sum(a * a, axis=1)
    sq_b = jnp.sum(b * b, axis=1)
    d2 = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * (a @ b.T), 0.0)
    return jnp.sqrt(d2)


@functools.partial(jax.jit, static_argnames=("embed_fn", "chunk"))
def sbsm_self_saliency(embed_fn, variables, x, masks, chunk: int = 128):
    """Self-similarity SBSM (reference SBSMBatch with x=None,
    explanations.py:107-112, 131-137): saliency of each image w.r.t. its own
    embedding. x: (B, H, W, C) -> (B, H, W)."""
    masks = masks.astype(jnp.float32)
    q = embed_fn(variables, x)  # (B, D)
    count = masks.shape[0] - jnp.sum(masks, axis=0)  # (H, W) coverage

    def per_image(args):
        img, q_emb = args
        me = _masked_embeds(embed_fn, variables, img, masks, chunk)  # (N, D)
        m_dist = jnp.linalg.norm(q_emb[None] - me, axis=1)  # (N,)
        k = (1.0 - masks) * m_dist[:, None, None]  # (N, H, W)
        return jnp.sum(k, axis=0) / jnp.maximum(count, 1.0)

    return jax.lax.map(per_image, (x, q))


@functools.partial(jax.jit, static_argnames=("embed_fn", "chunk"))
def sbsm_pair_saliency(embed_fn, variables, x_q, x, masks, chunk: int = 128):
    """Query-retrieval SBSM (reference SBSM.forward / SBSMBatch pair mode):
    for each (query q, retrieved r) pair, the distance increase
    (||e_q - e_masked_r|| - ||e_q - e_r||)+ accumulated at occluded pixels.

    x_q: (Bq, H, W, C), x: (B, H, W, C) -> (Bq, B, H, W).
    """
    masks = masks.astype(jnp.float32)
    q = embed_fn(variables, x_q)  # (Bq, D)
    r = embed_fn(variables, x)  # (B, D)
    o_dist = _cdist(q, r)  # (Bq, B)
    count = masks.shape[0] - jnp.sum(masks, axis=0)

    def per_retrieved(img):
        me = _masked_embeds(embed_fn, variables, img, masks, chunk)  # (N, D)
        return _cdist(q, me)  # (Bq, N)

    m_dist = jax.lax.map(per_retrieved, x)  # (B, Bq, N)
    m_dist = jnp.transpose(m_dist, (1, 0, 2))  # (Bq, B, N)
    excess = jnp.maximum(m_dist - o_dist[:, :, None], 0.0)  # (Bq, B, N)
    k = excess[..., None, None] * (1.0 - masks)[None, None]  # (Bq, B, N, H, W)
    return jnp.sum(k, axis=2) / jnp.maximum(count, 1.0)


# ---------------------------------------------------------------------------
# multi-device mask fan-out (the reference's one multi-GPU-optimized method:
# DataParallel over mask batches, README.md:76, compute_saliency.py:67,107,279,
# explanations.py:105-152). TPU-native form: the mask stack shards over the
# mesh `data` axis, every device embeds only its own masks, and the per-pixel
# numerator — which is a plain sum over masks — is reduced with one psum.
# Pad masks are all-ones (nothing occluded), so their (1 - mask) factor is
# exactly 0 and they contribute nothing; the coverage denominator is computed
# from the real mask stack outside the region.
# ---------------------------------------------------------------------------


def _pad_mask_axis(masks, n_dev: int):
    pad = (-masks.shape[0]) % n_dev
    if pad:
        masks = jnp.concatenate(
            [masks, jnp.ones((pad,) + masks.shape[1:], masks.dtype)], axis=0
        )
    return masks


@functools.partial(jax.jit, static_argnames=("embed_fn", "mesh", "chunk"))
def sbsm_self_saliency_mesh(embed_fn, variables, x, masks, mesh, chunk: int = 128):
    """`sbsm_self_saliency` with the mask axis sharded over the mesh `data`
    axis. Results equal the single-device path up to float summation order
    (the psum reassociates the over-masks sum)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    count = masks.shape[0] - jnp.sum(masks.astype(jnp.float32), axis=0)
    masks_p = _pad_mask_axis(masks, n_dev)
    local_chunk = min(chunk, masks_p.shape[0] // n_dev)

    def local(v, xx, qq, m_shard):
        m_shard = m_shard.astype(jnp.float32)

        def per_image(args):
            img, q_emb = args
            me = _masked_embeds(embed_fn, v, img, m_shard, local_chunk)
            m_dist = jnp.linalg.norm(q_emb[None] - me, axis=1)
            k = (1.0 - m_shard) * m_dist[:, None, None]
            return jnp.sum(k, axis=0)

        partial = jax.lax.map(per_image, (xx, qq))  # (B, H, W)
        return jax.lax.psum(partial, DATA_AXIS)

    q = embed_fn(variables, x)
    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS)),
        out_specs=P(),
    )
    numer = f(variables, x, q, masks_p)
    return numer / jnp.maximum(count, 1.0)


@functools.partial(jax.jit, static_argnames=("embed_fn", "mesh", "chunk"))
def sbsm_pair_saliency_mesh(
    embed_fn, variables, x_q, x, masks, mesh, chunk: int = 128
):
    """`sbsm_pair_saliency` with the mask axis sharded over the mesh `data`
    axis: x_q (Bq, H, W, C), x (B, H, W, C) -> (Bq, B, H, W)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    count = masks.shape[0] - jnp.sum(masks.astype(jnp.float32), axis=0)
    masks_p = _pad_mask_axis(masks, n_dev)
    local_chunk = min(chunk, masks_p.shape[0] // n_dev)

    def local(v, qq, xx, od, m_shard):
        m_shard = m_shard.astype(jnp.float32)

        def per_retrieved(img):
            me = _masked_embeds(embed_fn, v, img, m_shard, local_chunk)
            return _cdist(qq, me)  # (Bq, Nl)

        m_dist = jax.lax.map(per_retrieved, xx)  # (B, Bq, Nl)
        m_dist = jnp.transpose(m_dist, (1, 0, 2))  # (Bq, B, Nl)
        excess = jnp.maximum(m_dist - od[:, :, None], 0.0)
        k = excess[..., None, None] * (1.0 - m_shard)[None, None]
        return jax.lax.psum(jnp.sum(k, axis=2), DATA_AXIS)

    q = embed_fn(variables, x_q)
    r = embed_fn(variables, x)
    o_dist = _cdist(q, r)
    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS)),
        out_specs=P(),
    )
    numer = f(variables, q, x, o_dist, masks_p)
    return numer / jnp.maximum(count, 1.0)
