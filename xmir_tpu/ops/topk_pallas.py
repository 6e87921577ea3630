"""Pallas TPU kernel: fused similarity matmul + streaming top-K.

The north-star Milvus replacement (SURVEY.md §5, §7 step 4): gallery tiles
stream HBM->VMEM, scores come off the MXU, and a running per-query top-K
(value, index) buffer is merged on-chip — the (Q, N) score matrix never
exists in HBM. K is selected by iterative masked argmax (K passes over the
tile), which costs ~K/D of the matmul FLOPs (<2% for K=10, D>=512).

Semantics match ops/topk.py ``tiled_topk`` exactly, including tie-breaking by
lower gallery index. The kernel ranks by dot-product scores plus an optional
per-gallery-row bias, which expresses all supported metrics:
  cosine   : normalize inputs, bias = 0
  ip       : bias = 0
  l2       : bias = -||g||^2 / 2   (per-query constant dropped; true negative
             L2 values recomputed on the gathered top-K afterwards)
  hamming  : inputs sign-binarized to +/-1, values post-transformed
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _topk_kernel(q_ref, g_ref, bias_ref, vals_out, idxs_out, vals_s, idxs_s, *, k, k_pad, tile_g, n_real):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        vals_s[:] = jnp.full_like(vals_s, NEG_INF)
        idxs_s[:] = jnp.zeros_like(idxs_s)

    s = jnp.dot(
        q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32
    )  # (TQ, TG); bf16 inputs hit the MXU single-pass, f32 accumulate
    s = s + bias_ref[:]  # (1, TG) broadcast
    base = j * tile_g
    gcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(gcol < n_real, s, NEG_INF)

    combined = jnp.concatenate([vals_s[:], s], axis=1)  # (TQ, k_pad + TG)
    combined_idx = jnp.concatenate([idxs_s[:], gcol], axis=1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, combined.shape, 1)

    new_vals = vals_s[:]
    new_idxs = idxs_s[:]
    kcol = jax.lax.broadcasted_iota(jnp.int32, new_vals.shape, 1)
    col_ids_f = col_ids.astype(jnp.float32)
    combined_idx_f = combined_idx.astype(jnp.float32)
    # K passes of masked argmax; earlier positions win ties, and the running
    # buffer sits before the tile, so lower gallery indices win. Mosaic only
    # lowers float32 reductions, so the position/index selection runs in f32
    # (exact for indices < 2^24; galleries are sharded well below that).
    for kk in range(k):
        m = jnp.max(combined, axis=1)
        eq = combined == m[:, None]
        am = jnp.min(jnp.where(eq, col_ids_f, jnp.float32(3e9)), axis=1)
        onehot = col_ids_f == am[:, None]
        sel_idx = jnp.sum(jnp.where(onehot, combined_idx_f, 0.0), axis=1)
        new_vals = jnp.where(kcol == kk, m[:, None], new_vals)
        new_idxs = jnp.where(kcol == kk, sel_idx[:, None].astype(jnp.int32), new_idxs)
        combined = jnp.where(onehot, NEG_INF, combined)

    vals_s[:] = new_vals
    idxs_s[:] = new_idxs

    @pl.when(j == n_j - 1)
    def _():
        vals_out[:] = vals_s[:]
        idxs_out[:] = idxs_s[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "tile_g", "interpret", "compute_dtype")
)
def fused_topk_scores(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    bias: jnp.ndarray,
    k: int,
    tile_q: int = 128,
    tile_g: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Core fused kernel on dot-product+bias scores.

    queries (Q, D), gallery (N, D), bias (N,) added per gallery row.
    Returns (vals (Q, k) f32 sorted desc, idxs (Q, k) i32).

    compute_dtype=bfloat16 stores/multiplies inputs in bf16 (f32 accumulate):
    ~3x matmul throughput on the MXU for near-tie-level ranking differences —
    the fast serving mode; float32 (default) matches the XLA reference path
    bit-for-bit.
    """
    q_n, d = queries.shape
    n_real = gallery.shape[0]
    if k > n_real:
        raise ValueError(f"k={k} > gallery size {n_real}")

    k_pad = _round_up(max(k, 1), 128)
    d_pad = _round_up(d, 128)
    tile_g = min(tile_g, _round_up(n_real, 128))
    q_pad = _round_up(q_n, 8)
    tile_q = min(tile_q, q_pad)

    # clamp tiles to the ~16MB VMEM budget: double-buffered input blocks plus
    # the score tile, merge buffers, and top-K scratch must fit
    def vmem_bytes(tq, tg):
        inputs = 2 * (tq * d_pad + tg * d_pad + tg)  # double-buffered
        work = tq * tg + 2 * tq * (k_pad + tg) + 4 * tq * k_pad
        return 4 * (inputs + work)

    while tile_g > 128 and vmem_bytes(tile_q, tile_g) > 14 * 1024 * 1024:
        tile_g //= 2
    while tile_q > 8 and vmem_bytes(tile_q, tile_g) > 14 * 1024 * 1024:
        tile_q //= 2

    q_pad = _round_up(q_n, tile_q)
    n_pad = _round_up(n_real, tile_g)

    in_dtype = jnp.dtype(compute_dtype)
    qp = jnp.zeros((q_pad, d_pad), in_dtype).at[:q_n, :d].set(queries.astype(in_dtype))
    gp = jnp.zeros((n_pad, d_pad), in_dtype).at[:n_real, :d].set(gallery.astype(in_dtype))
    bp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n_real].set(bias.astype(jnp.float32))

    grid = (q_pad // tile_q, n_pad // tile_g)
    kernel = functools.partial(
        _topk_kernel, k=k, k_pad=k_pad, tile_g=tile_g, n_real=n_real
    )
    vals, idxs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_g), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k_pad), jnp.float32),
            pltpu.VMEM((tile_q, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad * d_pad + n_pad * d_pad + 2 * q_pad * k_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, gp, bp)
    return vals[:q_n, :k], idxs[:q_n, :k]


def fused_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    tile_q: int = 128,
    tile_g: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Metric-aware fused exact top-K (drop-in for ops.topk.tiled_topk)."""
    if metric == "cosine":
        q = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        g = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=-1, keepdims=True), 1e-12)
        bias = jnp.zeros((g.shape[0],), jnp.float32)
        return fused_topk_scores(q, g, bias, k, tile_q, tile_g, interpret, compute_dtype)
    if metric == "ip":
        bias = jnp.zeros((gallery.shape[0],), jnp.float32)
        return fused_topk_scores(queries, gallery, bias, k, tile_q, tile_g, interpret, compute_dtype)
    if metric == "l2":
        gsq = jnp.sum(gallery.astype(jnp.float32) ** 2, axis=-1)
        bias = -gsq / 2.0
        vals, idxs = fused_topk_scores(queries, gallery, bias, k, tile_q, tile_g, interpret, compute_dtype)
        # recompute true negative-L2 values on the gathered top-K
        gsel = jnp.take(gallery, idxs, axis=0)  # (Q, k, D)
        diff = queries[:, None, :].astype(jnp.float32) - gsel.astype(jnp.float32)
        true_vals = -jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        return true_vals, idxs
    if metric == "hamming":
        sq = jnp.where(queries >= 0, 1.0, -1.0).astype(jnp.float32)
        sg = jnp.where(gallery >= 0, 1.0, -1.0).astype(jnp.float32)
        bias = jnp.zeros((sg.shape[0],), jnp.float32)
        vals, idxs = fused_topk_scores(
            sq, sg, bias, k, tile_q, tile_g, interpret, compute_dtype
        )
        d = queries.shape[-1]
        return -(d - vals) / 2.0, idxs
    raise ValueError(f"unknown metric {metric!r}")
