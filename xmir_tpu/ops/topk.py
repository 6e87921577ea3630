"""Exact tiled top-K search over a gallery — the Milvus/faiss replacement core.

Two implementations with identical semantics:
  - ``tiled_topk``: pure-XLA ``lax.scan`` over gallery tiles; per tile one MXU
    matmul + ``lax.top_k`` merge against the running top-K. The (Q, N) score
    matrix never materializes; peak memory is O(Q * tile).
  - ``fused_topk`` (ops/topk_pallas.py): Pallas kernel fusing the score matmul
    with an on-chip streaming top-K merge.

Replaces the reference's Milvus ANN search (milvus/milvus_retrieval.py:79-86)
and faiss IndexFlatL2 (ATH.py:398-431) with exact search — the reference's
quality numbers are defined by FLAT / high-recall behavior.

Tie semantics: scores tie-break by LOWER gallery index first, matching
numpy ``argsort`` stable order used in the reference metrics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import scores as score_fn

NEG_INF = jnp.float32(-jnp.inf)


def _pad_gallery(gallery: jnp.ndarray, tile: int):
    n = gallery.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        gallery = jnp.concatenate(
            [gallery, jnp.zeros((n_pad, gallery.shape[1]), gallery.dtype)], axis=0
        )
    return gallery, n


def _merge_topk(vals, idxs, new_vals, new_idxs, k):
    """Merge running (Q,k) top-K with a fresh (Q,T) tile, keeping exact order.

    lax.top_k breaks ties by lower position; we order candidates as
    [running | tile] so earlier gallery indices win ties, and within the tile
    positions are already index-ordered.
    """
    cat_v = jnp.concatenate([vals, new_vals], axis=1)
    cat_i = jnp.concatenate([idxs, new_idxs], axis=1)
    v, pos = jax.lax.top_k(cat_v, k)
    i = jnp.take_along_axis(cat_i, pos, axis=1)
    return v, i


def tiled_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    tile: int = 2048,
    metric: str = "cosine",
    valid_count=None,
    pvary_axis=None,
    precision=None,
):
    """Exact top-k over the gallery.

    Returns (values (Q, k) float32, indices (Q, k) int32), sorted descending by
    score. Handles arbitrary N (internally pads to the tile size); indices of
    padded rows never appear because their score is -inf. ``valid_count``
    (traced scalar, default gallery length) marks trailing rows as padding —
    used by the sharded index whose last shard may be partially filled.
    ``precision`` (default: the XMIR_TOPK_PRECISION env, see
    ops.distance.resolve_precision) controls the score-matmul MXU precision;
    resolved HERE so the jit cache keys on the resolved value rather than
    baking in a stale env read.
    """
    from .distance import resolve_precision

    return _tiled_topk(
        queries, gallery, k, tile, metric, valid_count, pvary_axis,
        resolve_precision(precision),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "metric", "pvary_axis", "precision"),
)
def _tiled_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    tile: int = 2048,
    metric: str = "cosine",
    valid_count=None,
    pvary_axis=None,
    precision=None,
):
    n_real = gallery.shape[0]
    if k > n_real:
        raise ValueError(f"k={k} > gallery size {n_real}")
    tile = min(tile, _next_multiple(n_real, 128))
    gallery, n_real = _pad_gallery(gallery, tile)
    if valid_count is not None:
        n_real = valid_count
    n = gallery.shape[0]
    num_tiles = n // tile
    g_tiles = gallery.reshape(num_tiles, tile, gallery.shape[1])

    q = queries
    init_vals = jnp.full((q.shape[0], k), NEG_INF, jnp.float32)
    init_idxs = jnp.zeros((q.shape[0], k), jnp.int32)
    if pvary_axis is not None:
        # under shard_map the scan carry must carry the manual axis' varying
        # type to match the per-shard scores it merges with
        init_vals = jax.lax.pcast(init_vals, (pvary_axis,), to="varying")
        init_idxs = jax.lax.pcast(init_idxs, (pvary_axis,), to="varying")

    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    def body(carry, inp):
        vals, idxs = carry
        g_tile, t_idx = inp
        base = t_idx * tile
        s = score_fn(q, g_tile, metric, precision=precision)
        gidx = base + col
        s = jnp.where(gidx < n_real, s, NEG_INF)
        vals, idxs = _merge_topk(vals, idxs, s, jnp.broadcast_to(gidx, s.shape), k)
        return (vals, idxs), None

    (vals, idxs), _ = jax.lax.scan(
        body, (init_vals, init_idxs), (g_tiles, jnp.arange(num_tiles))
    )
    return vals, idxs


def _next_multiple(x: int, m: int) -> int:
    return -(-x // m) * m


def full_ranking(queries, gallery, metric: str = "cosine", precision=None):
    """Full gallery ranking (reference query_nih_zilliz.py:53 top_k=0 mode).

    Returns (scores (Q, N), ranks (Q, N)) — materializes O(Q*N); use only for
    eval-sized galleries.
    """
    s = score_fn(queries, gallery, metric, precision=precision)
    ranks = jnp.argsort(-s, axis=1, stable=True)
    return s, ranks


def exclude_self_topk(vals, idxs, query_ids, k):
    """Drop self-matches from an over-fetched top-(k+1) result.

    ``query_ids[i]`` is the gallery index of query i (or -1 if the query is not
    in the gallery). Keeps the first k non-self hits per row.
    """
    q = jnp.asarray(query_ids)[:, None]
    keep = idxs != q  # (Q, k+1) bool
    # stable-compact each row: order by (not keep), preserving original order
    order = jnp.argsort(~keep, axis=1, stable=True)
    vals_c = jnp.take_along_axis(vals, order, axis=1)
    idxs_c = jnp.take_along_axis(idxs, order, axis=1)
    return vals_c[:, :k], idxs_c[:, :k]
