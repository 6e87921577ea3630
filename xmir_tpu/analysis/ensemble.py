"""Embedding ensembling (reference postprocess.py:9-41): average /
concatenate / weighted combination with renormalization."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..losses.metric_losses import l2_normalize


def ensemble_embeddings(embeddings_list: Sequence, method: str = "average"):
    embs = [jnp.asarray(e) for e in embeddings_list]
    if method == "average":
        combined = jnp.mean(jnp.stack(embs, axis=0), axis=0)
    elif method == "concatenate":
        combined = jnp.concatenate(embs, axis=1)
    elif method == "weighted":
        w = 1.0 / len(embs)
        combined = sum(w * e for e in embs)
    else:
        raise ValueError(f"Unknown ensemble method: {method}")
    return l2_normalize(combined, axis=1)
