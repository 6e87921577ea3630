"""Insertion/deletion causal metrics as batched lax.map over reveal steps.

Reference evaluation.py:46-138 runs one forward pass per step per
query-retrieval pair, serially. Here all steps (and optionally all pairs) are
batched: the image at step i is reconstructed from the saliency rank mask
(pixels with rank < i*step come from `finish`, the rest from `start`) — no
in-place pixel swapping, so every step is a pure function of (start, finish,
order) and the whole curve is one vectorized computation.

Semantics match the reference exactly:
  n_steps = ceil(hw / step); scores[i] uses the image BEFORE step i's swap;
  score = cosine(q_feat, embed(current)), negatives clipped to 0 and counted;
  AUC = normalized trapezoid (metrics/saliency.py auc).
  del: start=image, finish=substrate; ins: start=substrate(image), finish=image.
"""
from __future__ import annotations

import functools
from typing import Callable, Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.saliency import auc as _auc_np


def saliency_rank(explanation: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel rank in decreasing saliency order (0 = most salient).
    explanation: (H, W) or (hw,) -> (hw,) int32 ranks.

    Matches np.argsort + flip ordering from the reference (ties resolved by
    later flat index first, because of the flip of a stable ascending sort).
    """
    flat = explanation.reshape(-1)
    hw = flat.shape[0]
    # reference: argsort ascending (stable) then reversed -> among ties, the
    # HIGHEST flat index gets the best rank. Emulate: sort by (value, index)
    # ascending, reverse.
    asc = jnp.argsort(flat, stable=True)
    desc = asc[::-1]
    ranks = jnp.zeros(hw, jnp.int32).at[desc].set(jnp.arange(hw, dtype=jnp.int32))
    return ranks


@functools.partial(
    jax.jit, static_argnames=("embed_fn", "step", "batch_steps")
)
def causal_scores(
    embed_fn,
    variables,
    q_feat: jnp.ndarray,
    start: jnp.ndarray,
    finish: jnp.ndarray,
    ranks: jnp.ndarray,
    step: int,
    batch_steps: int = 16,
):
    """Score curve for one pair. start/finish: (H, W, C) preprocessed images;
    ranks: (hw,) from saliency_rank; q_feat: (D,).

    Returns scores (n_steps+1,) float32 (unclipped cosine similarities).
    """
    h, w, c = start.shape
    hw = h * w
    n_steps = -(-hw // step)
    rank_img = ranks.reshape(h, w)

    step_ids = jnp.arange(n_steps + 1)
    pad = (-(n_steps + 1)) % batch_steps
    step_ids = jnp.concatenate([step_ids, jnp.zeros((pad,), step_ids.dtype)])
    chunks = step_ids.reshape(-1, batch_steps)

    def images_at(ids):
        # pixel from `finish` when its rank < i*step
        mask = rank_img[None] < (ids[:, None, None] * step)
        return jnp.where(mask[..., None], finish[None], start[None])

    def one_chunk(ids):
        embs = embed_fn(variables, images_at(ids))  # (bs, D)
        qn = q_feat / jnp.maximum(jnp.linalg.norm(q_feat), 1e-12)
        en = embs / jnp.maximum(
            jnp.linalg.norm(embs, axis=1, keepdims=True), 1e-12
        )
        return en @ qn

    scores = jax.lax.map(one_chunk, chunks).reshape(-1)
    return scores[: n_steps + 1]


def run_causal_metric(
    embed_fn,
    variables,
    query_image: jnp.ndarray,
    retrieved_image: jnp.ndarray,
    explanation,
    mode: Literal["del", "ins"],
    substrate_fn: Callable,
    step: int = 224,
    batch_steps: int = 16,
) -> Tuple[float, int, np.ndarray]:
    """Full single-pair run (reference CausalMetric.single_run,
    evaluation.py:65-138). Returns (auc, zero_clip_count, clipped_scores)."""
    q_feat = embed_fn(variables, query_image[None])[0]
    if mode == "del":
        start, finish = retrieved_image, substrate_fn(retrieved_image[None])[0]
    elif mode == "ins":
        start, finish = substrate_fn(retrieved_image[None])[0], retrieved_image
    else:
        raise ValueError("mode must be 'del' or 'ins'")
    ranks = saliency_rank(jnp.asarray(explanation))
    scores = np.asarray(
        causal_scores(
            embed_fn, variables, q_feat, start, finish, ranks, step, batch_steps
        )
    )
    zero_cntr = int((scores < 0).sum())
    clipped = np.clip(scores, 0.0, 1.0)
    # reference clips only negative values (min=0); positive >1 can't occur
    # for cosine, but keep exact clip(0, 1) as in evaluation.py:104-106
    return _auc_np(clipped), zero_cntr, clipped


def auto_batch_steps(hw: int, step: int, p_n: int, target: int = 128) -> int:
    """Pick batch_steps so each forward embeds ~128 images at a
    multiple-of-8 batch. The chip sweep (tools/profile_insdel.py + the r5
    follow-ups, DenseNet121@224 bf16, 52 reveal slots, both curves stacked):

      batch 128 (p16 x bs8)   59.4 pair-evals/s   <- peak
      batch 120 (p10 x bs12)  56.3
      batch 180 (p10 x bs18)  55.6
      batch 208-520           54.2-56.2           (flat past saturation)
      batch 130 (p10 x bs13)  34.0                <- non-x8 batch cliff
      batch  64 (old fixed bs=8 single-mode)      46% of raw embed rate

    The raw embed curve itself is non-monotonic (6,776 img/s @128 vs
    6,053 @180, 6,285 @208): XLA's conv layouts favor the 128 batch, and a
    batch that is not a multiple of 8 falls off a ~40% cliff. So: batch as
    close to `target` as possible, rounded DOWN until divisible by 8
    (p_n is the stacked pair count — 2 x top-k for the both-curves path)."""
    n_slots = hw // step + (1 if hw % step else 0) + 1  # n_steps + 1
    p_n = max(p_n, 1)
    bs = max(1, min(round(target / p_n), n_slots))
    while bs > 1 and (bs * p_n) % 8:
        bs -= 1
    return bs


@functools.partial(jax.jit, static_argnames=("embed_fn", "step", "batch_steps"))
def causal_scores_batch(
    embed_fn,
    variables,
    q_feat: jnp.ndarray,
    starts: jnp.ndarray,
    finishes: jnp.ndarray,
    ranks: jnp.ndarray,
    step: int,
    batch_steps: int = 8,
):
    """Score curves for P pairs sharing one query, batched: each chunk embeds
    P * batch_steps images in one forward (vs the reference's one forward per
    step per pair, evaluation.py:100-136).

    starts/finishes: (P, H, W, C); ranks: (P, hw); q_feat: (D,).
    Returns (P, n_steps+1) float32 unclipped cosine scores.
    """
    p_n, h, w, c = starts.shape
    hw = h * w
    n_steps = -(-hw // step)
    rank_img = ranks.reshape(p_n, h, w)

    step_ids = jnp.arange(n_steps + 1)
    pad = (-(n_steps + 1)) % batch_steps
    step_ids = jnp.concatenate([step_ids, jnp.zeros((pad,), step_ids.dtype)])
    chunks = step_ids.reshape(-1, batch_steps)
    qn = q_feat / jnp.maximum(jnp.linalg.norm(q_feat), 1e-12)

    def one_chunk(ids):
        # (bs, P, H, W) mask -> (bs*P, H, W, C) images
        mask = rank_img[None] < (ids[:, None, None, None] * step)
        imgs = jnp.where(mask[..., None], finishes[None], starts[None])
        imgs = imgs.reshape(batch_steps * p_n, h, w, c)
        embs = embed_fn(variables, imgs)
        en = embs / jnp.maximum(jnp.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        return (en @ qn).reshape(batch_steps, p_n)

    scores = jax.lax.map(one_chunk, chunks)  # (n_chunks, bs, P)
    scores = scores.reshape(-1, p_n)[: n_steps + 1]
    return scores.T  # (P, n_steps+1)


@functools.partial(
    jax.jit, static_argnames=("embed_fn", "step", "mesh", "batch_steps")
)
def causal_scores_batch_mesh(
    embed_fn,
    variables,
    q_feat: jnp.ndarray,
    starts: jnp.ndarray,
    finishes: jnp.ndarray,
    ranks: jnp.ndarray,
    step: int,
    mesh,
    batch_steps: int = 8,
):
    """`causal_scores_batch` with the PAIR axis sharded over the mesh `data`
    axis: every device runs the full reveal-step curve for its own
    query-retrieval pairs (the multi-device form of the reference's serial
    per-pair loop, evaluate_test_dataset_milvus.py:446-590). Embarrassingly
    parallel — no cross-pair reduction, so per-pair results match the
    single-device path. Pads the pair axis with zero images (sliced off)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    p_n = starts.shape[0]
    pad = (-p_n) % n_dev
    if pad:
        zimg = jnp.zeros((pad,) + starts.shape[1:], starts.dtype)
        starts = jnp.concatenate([starts, zimg], axis=0)
        finishes = jnp.concatenate([finishes, zimg], axis=0)
        ranks = jnp.concatenate(
            [ranks, jnp.zeros((pad,) + ranks.shape[1:], ranks.dtype)], axis=0
        )

    def local(v, qf, st, fi, rk):
        return causal_scores_batch(
            embed_fn, v, qf, st, fi, rk, step, batch_steps
        )

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )
    return f(variables, q_feat, starts, finishes, ranks)[:p_n]


def run_causal_metric_pairs(
    embed_fn,
    variables,
    query_image: jnp.ndarray,
    retrieved_images: jnp.ndarray,
    explanations,
    mode: Literal["del", "ins"],
    substrate_fn: Callable,
    step: int = 224,
    batch_steps: int = 0,
    mesh=None,
):
    """Batched multi-pair run for one query. retrieved_images (P, H, W, C),
    explanations (P, H, W). Returns lists of (auc, zero_count) per pair.
    With ``mesh``, pairs fan out over the mesh data axis
    (causal_scores_batch_mesh). batch_steps=0 picks the throughput-tuned
    chunking (auto_batch_steps)."""
    q_feat = embed_fn(variables, query_image[None])[0]
    subs = substrate_fn(retrieved_images)
    if mode == "del":
        starts, finishes = retrieved_images, subs
    elif mode == "ins":
        starts, finishes = subs, retrieved_images
    else:
        raise ValueError("mode must be 'del' or 'ins'")
    ranks = jnp.stack([saliency_rank(jnp.asarray(e)) for e in explanations])
    scores = _scores_dispatch(
        embed_fn, variables, q_feat, starts, finishes, ranks, step,
        batch_steps, mesh,
    )
    out = []
    for p in range(scores.shape[0]):
        clipped = np.clip(scores[p], 0.0, 1.0)
        out.append((_auc_np(clipped), int((scores[p] < 0).sum())))
    return out


def _scores_dispatch(embed_fn, variables, q_feat, starts, finishes, ranks,
                     step, batch_steps, mesh):
    if not batch_steps:
        h, w = starts.shape[1:3]
        p_eff = starts.shape[0] if mesh is None else -(
            -starts.shape[0] // mesh.shape["data"]
        )
        batch_steps = auto_batch_steps(h * w, step, p_eff)
    if mesh is not None:
        return np.asarray(
            causal_scores_batch_mesh(
                embed_fn, variables, q_feat, starts, finishes, ranks, step,
                mesh, batch_steps,
            )
        )
    return np.asarray(
        causal_scores_batch(
            embed_fn, variables, q_feat, starts, finishes, ranks, step,
            batch_steps,
        )
    )


def run_causal_metric_pairs_both(
    embed_fn,
    variables,
    query_image: jnp.ndarray,
    retrieved_images: jnp.ndarray,
    explanations,
    del_substrate_fn: Callable,
    ins_substrate_fn: Callable,
    step: int = 224,
    batch_steps: int = 0,
    mesh=None,
):
    """Deletion AND insertion curves for P pairs in ONE batched computation:
    the two modes stack along the pair axis (2P pairs), so every forward
    embeds twice the images of a single-mode call — at the reference's
    top-k=5 the single-mode batch underfills the chip (the r4 bench ran 46%
    of raw embed rate; see auto_batch_steps). Per-pair results are exactly
    those of two run_causal_metric_pairs calls (eval-mode towers are
    batch-element-independent). Returns (del_results, ins_results), each a
    list of (auc, zero_count)."""
    p_n = retrieved_images.shape[0]
    q_feat = embed_fn(variables, query_image[None])[0]
    del_sub = del_substrate_fn(retrieved_images)
    ins_sub = ins_substrate_fn(retrieved_images)
    starts = jnp.concatenate([retrieved_images, ins_sub], axis=0)
    finishes = jnp.concatenate([del_sub, retrieved_images], axis=0)
    ranks1 = jnp.stack([saliency_rank(jnp.asarray(e)) for e in explanations])
    ranks = jnp.concatenate([ranks1, ranks1], axis=0)
    scores = _scores_dispatch(
        embed_fn, variables, q_feat, starts, finishes, ranks, step,
        batch_steps, mesh,
    )
    out = []
    for p in range(scores.shape[0]):
        clipped = np.clip(scores[p], 0.0, 1.0)
        out.append((_auc_np(clipped), int((scores[p] < 0).sum())))
    return out[:p_n], out[p_n:]


def zeros_substrate(images):
    return jnp.zeros_like(images)


def blur_substrate(klen: int = 51, nsig: float = 50**0.5):
    from ..ops.blur import gaussian_blur

    return lambda images: gaussian_blur(images, klen, nsig)
