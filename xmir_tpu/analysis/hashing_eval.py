"""Deep-hashing retrieval evaluation (reference test_ath.py:57-200 and the
faiss variant ATH.py:398-431): Hamming distance on sign-binarized codes (or
L2 on real codes) -> mHR@K / mAP@K / mRR@K / mP@K / R@K / majority accuracy,
plus classification accuracy from the type head.

The distance computation runs as one MXU matmul (ops/distance.py
neg_hamming_scores) instead of the reference's (Q, G, bits) broadcast.
"""
from __future__ import annotations

from collections import Counter
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.distance import neg_hamming_scores, neg_l2_scores


def hash_retrieval_metrics(
    query_codes: np.ndarray,
    query_labels: np.ndarray,
    gallery_codes: np.ndarray,
    gallery_labels: np.ndarray,
    query_logits: np.ndarray | None = None,
    topk_values: Sequence[int] = (1, 5, 10),
    binary_codes: bool = True,
):
    if binary_codes:
        scores = np.asarray(
            neg_hamming_scores(jnp.asarray(query_codes), jnp.asarray(gallery_codes))
        )
    else:
        scores = np.asarray(
            neg_l2_scores(jnp.asarray(query_codes), jnp.asarray(gallery_codes))
        )
    sorted_idx = np.argsort(-scores, axis=1, kind="stable")
    q_labels = np.asarray(query_labels)
    g_labels = np.asarray(gallery_labels)
    total_relevant = {
        int(c): int((g_labels == c).sum()) for c in np.unique(q_labels)
    }

    retrieval = {}
    for topk in topk_values:
        hit, ap, rr, vote, p_at_k, r_at_k = [], [], [], [], [], []
        for row in range(len(q_labels)):
            label = int(q_labels[row])
            ranked = g_labels[sorted_idx[row, :topk]]
            matches = (ranked == label).astype(np.int32)
            hit.append(float(matches.any()))
            n_rel = int(matches.sum())
            p_at_k.append(n_rel / topk)
            tot = total_relevant.get(label, 0)
            r_at_k.append(n_rel / tot if tot > 0 else 0.0)
            if n_rel == 0:
                ap.append(0.0)
                rr.append(0.0)
            else:
                first = None
                psum, pos = 0.0, 0
                for rank, m in enumerate(matches, start=1):
                    if m:
                        pos += 1
                        psum += pos / rank
                        if first is None:
                            first = rank
                ap.append(psum / pos)
                rr.append(1.0 / first)
            vote.append(
                float(Counter(ranked.tolist()).most_common(1)[0][0] == label)
            )
        retrieval[topk] = {
            "mhr": float(np.mean(hit)),
            "map": float(np.mean(ap)),
            "mrr": float(np.mean(rr)),
            "mp@k": float(np.mean(p_at_k)),
            "r@k": float(np.mean(r_at_k)),
            "majority_acc": float(np.mean(vote)),
        }
    out = {"retrieval": retrieval}
    if query_logits is not None:
        out["classification_acc"] = float(
            (np.argmax(query_logits, axis=1) == q_labels).mean()
        )
    return out


def binarize_codes(codes: np.ndarray) -> np.ndarray:
    """(code >= 0) binarization (reference test_ath.py:66)."""
    return (np.asarray(codes) >= 0).astype(np.float32)
