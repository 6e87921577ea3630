"""Similarity score primitives for retrieval.

Score convention everywhere: HIGHER = MORE SIMILAR (matching the reference's
"distance" matrices that are really similarities — negative L2 in test.py:1080,
cosine in train.py:405 and the Milvus COSINE metric in milvus_setup.py:191-222,
Hamming for ATH hashing in test_ath.py:57-100).
"""
from __future__ import annotations

import os

import jax.numpy as jnp


def resolve_precision(precision=None):
    """None -> the XMIR_TOPK_PRECISION env default ('default').

    TPU DEFAULT matmul precision rounds f32 inputs to bf16 on the MXU, so
    scores of near-ties closer than ~2^-8 relative may reorder vs a float64
    brute force; 'highest' keeps true f32 (the reference scores in f32,
    test.py:1080 torch.cdist / Milvus COSINE) at ~2-3x matmul cost. Offline
    eval CLIs default this env to 'highest'; serving keeps 'default'.
    """
    if precision is None:
        precision = os.environ.get("XMIR_TOPK_PRECISION", "default")
    return precision


def cosine_scores(queries: jnp.ndarray, gallery: jnp.ndarray, precision=None) -> jnp.ndarray:
    """(Q, D) x (N, D) -> (Q, N) cosine similarity. Inputs are normalized here
    so callers can pass raw embeddings."""
    q = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    g = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=-1, keepdims=True), 1e-12)
    return jnp.dot(q, g.T, preferred_element_type=jnp.float32,
                   precision=resolve_precision(precision))


def dot_scores(queries: jnp.ndarray, gallery: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Inner-product scores (Milvus metric IP); assumes pre-normalized inputs
    when cosine semantics are desired."""
    return jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32,
                   precision=resolve_precision(precision))


def neg_l2_scores(queries: jnp.ndarray, gallery: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Negative squared-L2-derived euclidean scores: -(||q - g||)."""
    qsq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)
    gsq = jnp.sum(gallery.astype(jnp.float32) ** 2, axis=-1)
    d2 = qsq[:, None] + gsq[None, :] - 2.0 * jnp.dot(
        queries, gallery.T, preferred_element_type=jnp.float32,
        precision=resolve_precision(precision),
    )
    return -jnp.sqrt(jnp.maximum(d2, 0.0))


def neg_hamming_scores(query_codes: jnp.ndarray, gallery_codes: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Negative Hamming distance between sign-binarized hash codes.

    Codes enter as real-valued hash outputs; binarization is (code >= 0) as in
    reference test_ath.py:57-100. With s in {-1, +1}: hamming = (D - s_q.s_g)/2,
    computed as one MXU matmul.
    """
    sq = jnp.where(query_codes >= 0, 1.0, -1.0).astype(jnp.float32)
    sg = jnp.where(gallery_codes >= 0, 1.0, -1.0).astype(jnp.float32)
    d = sq.shape[-1]
    return -(d - jnp.dot(sq, sg.T, preferred_element_type=jnp.float32,
                         precision=resolve_precision(precision))) / 2.0


SCORE_FNS = {
    "cosine": cosine_scores,
    "ip": dot_scores,
    "l2": neg_l2_scores,
    "hamming": neg_hamming_scores,
}


def scores(queries, gallery, metric: str = "cosine", precision=None):
    try:
        return SCORE_FNS[metric](queries, gallery, precision=precision)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; options: {sorted(SCORE_FNS)}")
