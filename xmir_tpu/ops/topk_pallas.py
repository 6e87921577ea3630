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


def _resolve_precision(precision):
    """None -> the XMIR_TOPK_PRECISION env default ('default'): TPU DEFAULT
    matmul precision rounds f32 inputs to bf16 on the MXU — the same
    semantics as the XLA tiled_topk path, so near-ties closer than ~2^-8
    relative may order differently from a float64 brute force. 'highest'
    runs the score matmul in the multi-pass true-f32 form for tie-exact
    rankings at ~2-3x matmul cost (serving keeps 'default')."""
    import os

    if precision is None:
        precision = os.environ.get("XMIR_TOPK_PRECISION", "default")
    if isinstance(precision, str):
        return {
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
    return precision


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _merge_candidates(vals, idxs, cand_v, cand_i_f, k):
    """Merge the running sorted top-k buffer with a candidate block.

    ``vals``/``idxs``: (TQ, k_pad) running buffer, sorted desc by
    (value, then ascending gallery index); slots >= k hold -inf.
    ``cand_v``: (TQ, W) candidate scores (-inf = empty slot);
    ``cand_i_f``: their gallery indices as float32 (exact for idx < 2^24 —
    Mosaic only lowers float32 reductions; sharded galleries stay well below).
    Ties break to the lower gallery index; the buffer's indices are always
    lower than any candidate's (candidates come from later tiles), so the
    buffer wins equal-value ties, matching ops.topk.tiled_topk / argsort.
    """
    combined = jnp.concatenate([vals, cand_v], axis=1)
    combined_idx = jnp.concatenate([idxs.astype(jnp.float32), cand_i_f], axis=1)
    new_vals = vals
    new_idxs = idxs
    kcol = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    for kk in range(k):
        m = jnp.max(combined, axis=1)
        eq = combined == m[:, None]
        am = jnp.min(jnp.where(eq, combined_idx, jnp.float32(3e9)), axis=1)
        pick = jnp.logical_and(eq, combined_idx == am[:, None])
        new_vals = jnp.where(kcol == kk, m[:, None], new_vals)
        new_idxs = jnp.where(kcol == kk, am[:, None].astype(jnp.int32), new_idxs)
        combined = jnp.where(pick, NEG_INF, combined)
    return new_vals, new_idxs


def _topk_kernel(q_ref, g_ref, bias_ref, vals_out, idxs_out, vals_s, idxs_s, *, k, k_pad, tile_g, n_real, precision=None):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        vals_s[:] = jnp.full_like(vals_s, NEG_INF)
        idxs_s[:] = jnp.zeros_like(idxs_s)

    s = jnp.dot(
        q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TQ, TG); bf16 inputs hit the MXU single-pass, f32 accumulate
    s = s + bias_ref[:]  # (1, TG) broadcast
    base = j * tile_g
    gcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(gcol < n_real, s, NEG_INF)

    new_vals, new_idxs = _merge_candidates(
        vals_s[:], idxs_s[:], s, gcol.astype(jnp.float32), k
    )
    vals_s[:] = new_vals
    idxs_s[:] = new_idxs

    @pl.when(j == n_j - 1)
    def _():
        vals_out[:] = vals_s[:]
        idxs_out[:] = idxs_s[:]


def _topk_kernel_pruned(
    q_ref, g_ref, bias_ref, vals_out, idxs_out, vals_s, idxs_s,
    pend_v1, pend_i1, pend_v2, pend_i2,
    *, k, k_pad, tile_g, n_real, precision=None,
):
    """Exact fused top-K with candidate pruning (the fast path, k <= 128).

    The K-pass masked-argmax merge touches every score ~60 times on the VPU
    at K=10, which dominates the MXU matmul. This kernel instead prunes each
    tile against theta = the running k-th best score and keeps the top TWO
    surviving candidates per vector lane (a running 2-deep insertion over the
    tile's 128-wide chunks, ~11 VPU ops per score). Merging is deferred:

    - two-level pending buffer: surviving lane candidates accumulate across
      tiles in two (TQ, 128) scratch slots per lane (slot 1 filled first);
      they are flushed into the top-k buffer only when a lane would need a
      third slot. With 2 slots the flush probability falls quadratically in
      the candidate density, so steady-state flushes are rare.
    - spill fallback: if >= 3 candidates of one tile share a lane (counted
      per lane), that tile is merged exactly via the full K-pass path.
      Early tiles always spill (theta = -inf), which warms the buffer.

    Both events are detected with data-dependent ``pl.when`` scalars, so the
    steady-state cost is the lane scan alone. Exactness: a candidate is lost
    only by lane collision, and every collision (3+ within a tile, or
    tile-plus-pending overflow) triggers the exact merge instead.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        vals_s[:] = jnp.full_like(vals_s, NEG_INF)
        idxs_s[:] = jnp.zeros_like(idxs_s)
        pend_v1[:] = jnp.full_like(pend_v1, NEG_INF)
        pend_i1[:] = jnp.zeros_like(pend_i1)
        pend_v2[:] = jnp.full_like(pend_v2, NEG_INF)
        pend_i2[:] = jnp.zeros_like(pend_i2)

    s = jnp.dot(q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32,
                precision=precision)
    s = s + bias_ref[:]
    base = j * tile_g
    gcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(gcol < n_real, s, NEG_INF)

    tq = s.shape[0]
    theta = vals_s[:, k - 1 : k]  # (TQ, 1) current k-th best; -inf until full.
    # Strictly-greater pruning is exact: an element equal to theta has a
    # higher gallery index than every buffer entry (later tile), so it can
    # never displace one under (value, then lower-index) ordering.
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    t_v1 = jnp.full((tq, 128), NEG_INF, jnp.float32)
    t_c1 = jnp.zeros((tq, 128), jnp.int32)
    t_v2 = jnp.full((tq, 128), NEG_INF, jnp.float32)
    t_c2 = jnp.zeros((tq, 128), jnp.int32)
    cnt = jnp.zeros((tq, 128), jnp.float32)
    for c in range(tile_g // 128):
        sc = s[:, c * 128 : (c + 1) * 128]
        pc = sc > theta
        cnt = cnt + pc.astype(jnp.float32)
        scm = jnp.where(pc, sc, NEG_INF)
        gt1 = scm > t_v1  # strict: earlier chunk (lower index) wins ties
        demo_v = jnp.where(gt1, t_v1, scm)  # loser of the slot-1 comparison
        demo_c = jnp.where(gt1, t_c1, c)
        t_v1 = jnp.where(gt1, scm, t_v1)
        t_c1 = jnp.where(gt1, c, t_c1)
        gt2 = demo_v > t_v2
        t_v2 = jnp.where(gt2, demo_v, t_v2)
        t_c2 = jnp.where(gt2, demo_c, t_c2)
    t_idx1 = base + t_c1 * 128 + lane
    t_idx2 = base + t_c2 * 128 + lane

    spill = jnp.max(cnt) >= 3.0
    occ = (
        jnp.where(pend_v1[:] > NEG_INF, 1.0, 0.0)
        + jnp.where(pend_v2[:] > NEG_INF, 1.0, 0.0)
        + jnp.where(t_v1 > NEG_INF, 1.0, 0.0)
        + jnp.where(t_v2 > NEG_INF, 1.0, 0.0)
    )
    flush = jnp.max(occ) > 2.0

    @pl.when(spill)
    def _():
        nv, ni = _merge_candidates(vals_s[:], idxs_s[:], s, gcol.astype(jnp.float32), k)
        vals_s[:] = nv
        idxs_s[:] = ni

    @pl.when(jnp.logical_and(jnp.logical_not(spill), flush))
    def _():
        pend = jnp.concatenate([pend_v1[:], pend_v2[:]], axis=1)
        pidx = jnp.concatenate([pend_i1[:], pend_i2[:]], axis=1)
        nv, ni = _merge_candidates(vals_s[:], idxs_s[:], pend, pidx.astype(jnp.float32), k)
        vals_s[:] = nv
        idxs_s[:] = ni
        pend_v1[:] = t_v1
        pend_i1[:] = t_idx1
        pend_v2[:] = t_v2
        pend_i2[:] = t_idx2

    @pl.when(jnp.logical_and(jnp.logical_not(spill), jnp.logical_not(flush)))
    def _():
        # enough free slots per lane: fill slot 1 first, overflow to slot 2.
        # Invariant: slot 2 occupied implies slot 1 occupied, so the carried
        # candidate is -inf whenever slot 2 is already taken (no-flush case).
        e1 = pend_v1[:] <= NEG_INF
        nv1 = jnp.where(e1, t_v1, pend_v1[:])
        ni1 = jnp.where(e1, t_idx1, pend_i1[:])
        carry_v = jnp.where(e1, t_v2, t_v1)
        carry_i = jnp.where(e1, t_idx2, t_idx1)
        e2 = pend_v2[:] <= NEG_INF
        pend_v2[:] = jnp.where(e2, carry_v, pend_v2[:])
        pend_i2[:] = jnp.where(e2, carry_i, pend_i2[:])
        pend_v1[:] = nv1
        pend_i1[:] = ni1

    @pl.when(j == n_j - 1)
    def _():
        pend = jnp.concatenate([pend_v1[:], pend_v2[:]], axis=1)
        pidx = jnp.concatenate([pend_i1[:], pend_i2[:]], axis=1)
        nv, ni = _merge_candidates(vals_s[:], idxs_s[:], pend, pidx.astype(jnp.float32), k)
        vals_out[:] = nv
        idxs_out[:] = ni


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile_q", "tile_g", "interpret", "compute_dtype", "algorithm",
        "out_vma", "precision",
    ),
)
def fused_topk_scores(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    bias: jnp.ndarray,
    k: int,
    tile_q: int = 512,
    tile_g: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    algorithm: str = "auto",
    out_vma: tuple = (),
    precision: str = None,
):
    """Core fused kernel on dot-product+bias scores.

    queries (Q, D), gallery (N, D), bias (N,) added per gallery row.
    Returns (vals (Q, k) f32 sorted desc, idxs (Q, k) i32).

    compute_dtype=bfloat16 stores/multiplies inputs in bf16 (f32 accumulate):
    ~3x matmul throughput on the MXU for near-tie-level ranking differences —
    the fast serving mode; float32 (default) matches the XLA reference path
    bit-for-bit.

    algorithm: "pruned" (exact, lane-pruned merge — fastest, k <= 128),
    "merge" (exact K-pass merge every tile), or "auto" (pruned when k <= 128).
    Both are exact; they differ only in VPU work per score.

    out_vma: mesh axis names the outputs vary over — required when calling
    from inside ``shard_map`` with vma checking on (the sharded gallery
    search); pallas_call outputs otherwise carry no vma and fail the check.
    """
    q_n, d = queries.shape
    n_real = gallery.shape[0]
    if k > n_real:
        raise ValueError(f"k={k} > gallery size {n_real}")
    if algorithm == "auto":
        algorithm = "pruned" if (k <= 128 and tile_g % 128 == 0) else "merge"
    if algorithm == "pruned" and k > 128:
        raise ValueError("algorithm='pruned' supports k <= 128")
    if algorithm == "pruned" and tile_g % 128 != 0:
        raise ValueError("algorithm='pruned' needs tile_g to be a multiple of 128")
    if algorithm not in ("pruned", "merge"):
        raise ValueError(f"unknown algorithm {algorithm!r}")

    k_pad = _round_up(max(k, 1), 128)
    d_pad = _round_up(d, 128)
    tile_g = min(tile_g, _round_up(n_real, 128))
    q_pad = _round_up(q_n, 8)
    tile_q = min(tile_q, q_pad)

    # clamp tiles to the VMEM budget: double-buffered input blocks plus the
    # score tile, merge buffers, and top-K scratch must fit. The pruned
    # kernel raises the Mosaic scoped-vmem limit (v5e has 128MB physical;
    # the 16MB default exists for pipelining headroom), so it can afford the
    # large tiles that keep the MXU matmul efficient.
    isz = jnp.dtype(compute_dtype).itemsize

    def vmem_bytes(tq, tg):
        inputs = isz * 2 * (tq * d_pad + tg * d_pad) + 4 * 2 * tg  # double-buffered
        work = 4 * (tq * tg + 2 * tq * (k_pad + tg) + 4 * tq * k_pad)
        return inputs + work

    budget = 40 * 1024 * 1024 if algorithm == "pruned" else 14 * 1024 * 1024
    while tile_g > 128 and vmem_bytes(tile_q, tile_g) > budget:
        tile_g //= 2
    if algorithm == "pruned" and tile_g % 128 != 0:
        # the halving clamp can break the pruned kernel's 128-lane chunk
        # invariant (e.g. a user tile_g of 384 -> 192); re-round down so no
        # ragged trailing columns are silently skipped by the chunk scan
        tile_g = max(128, (tile_g // 128) * 128)
    while tile_q > 8 and vmem_bytes(tile_q, tile_g) > budget:
        tile_q //= 2

    q_pad = _round_up(q_n, tile_q)
    n_pad = _round_up(n_real, tile_g)

    in_dtype = jnp.dtype(compute_dtype)
    # Zero-copy fast paths: skip the pad when an input already has the padded
    # shape and dtype. Outside jit loops XLA hoists the loop-invariant pad
    # copy, but inside shard_map (the sharded serving path) it does NOT — a
    # per-call full-gallery materialization that cost ~40% of sharded-search
    # throughput before ShardedGalleryIndex.build() learned to align shards.
    if queries.shape == (q_pad, d_pad) and queries.dtype == in_dtype:
        qp = queries
    else:
        qp = jnp.zeros((q_pad, d_pad), in_dtype).at[:q_n, :d].set(
            queries.astype(in_dtype)
        )
    if gallery.shape == (n_pad, d_pad) and gallery.dtype == in_dtype:
        gp = gallery
    else:
        gp = jnp.zeros((n_pad, d_pad), in_dtype).at[:n_real, :d].set(
            gallery.astype(in_dtype)
        )
    if n_real == n_pad:
        bp = bias.astype(jnp.float32).reshape(1, n_pad)
    else:
        bp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n_real].set(
            bias.astype(jnp.float32)
        )

    grid = (q_pad // tile_q, n_pad // tile_g)
    scratch_shapes = [
        pltpu.VMEM((tile_q, k_pad), jnp.float32),
        pltpu.VMEM((tile_q, k_pad), jnp.int32),
    ]
    if algorithm == "pruned":
        kernel_fn = _topk_kernel_pruned
        scratch_shapes += [
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.int32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.int32),
        ]
    else:
        kernel_fn = _topk_kernel
    kernel = functools.partial(
        kernel_fn, k=k, k_pad=k_pad, tile_g=tile_g, n_real=n_real,
        precision=_resolve_precision(precision),
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
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32, vma=frozenset(out_vma)),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32, vma=frozenset(out_vma)),
        ],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad * d_pad + n_pad * d_pad + 2 * q_pad * k_pad) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                96 * 1024 * 1024 if algorithm == "pruned" else 16 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(qp, gp, bp)
    return vals[:q_n, :k], idxs[:q_n, :k]


def fused_topk_masked(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    valid_count,
    metric: str = "cosine",
    tile_q: int = 512,
    tile_g: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    algorithm: str = "auto",
    out_vma: tuple = (),
    precision: str = None,
):
    """fused_topk with a traced per-call validity count.

    Rows >= ``valid_count`` are treated as padding (score -inf, never
    selected) — the shard-local form the sharded gallery search needs, where
    the last mesh shard may be partially filled (index/gallery.py). The mask
    rides the kernel's existing per-gallery-row score bias, so the Pallas
    kernels themselves are untouched; ``valid_count`` may be a traced scalar
    (e.g. derived from ``lax.axis_index`` inside shard_map).

    When k exceeds ``valid_count``, trailing slots return value -inf with
    index 0 — identical to ops.topk.tiled_topk's valid_count semantics, so
    the cross-shard merge can filter them uniformly.
    """
    n = gallery.shape[0]
    if precision is None:
        import os
        precision = os.environ.get("XMIR_TOPK_PRECISION", "default")
    mask_bias = jnp.where(
        jnp.arange(n) < valid_count, jnp.float32(0), jnp.float32(NEG_INF)
    )
    if metric == "cosine":
        q = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        g = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=-1, keepdims=True), 1e-12)
        return fused_topk_scores(q, g, mask_bias, k, tile_q, tile_g, interpret, compute_dtype, algorithm, out_vma, precision)
    if metric == "ip":
        return fused_topk_scores(queries, gallery, mask_bias, k, tile_q, tile_g, interpret, compute_dtype, algorithm, out_vma, precision)
    if metric == "l2":
        gsq = jnp.sum(gallery.astype(jnp.float32) ** 2, axis=-1)
        vals, idxs = fused_topk_scores(
            queries, gallery, mask_bias - gsq / 2.0, k,
            tile_q, tile_g, interpret, compute_dtype, algorithm, out_vma,
            precision,
        )
        # recompute true negative-L2 on the gathered top-K, preserving the
        # -inf markers of sub-k slots (invalid/padded rows gather row 0's
        # embedding, which must not leak a finite score into the merge)
        gsel = jnp.take(gallery, idxs, axis=0)
        diff = queries[:, None, :].astype(jnp.float32) - gsel.astype(jnp.float32)
        true_vals = -jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        return jnp.where(jnp.isneginf(vals), vals, true_vals), idxs
    if metric == "hamming":
        sq = jnp.where(queries >= 0, 1.0, -1.0).astype(jnp.float32)
        sg = jnp.where(gallery >= 0, 1.0, -1.0).astype(jnp.float32)
        vals, idxs = fused_topk_scores(
            sq, sg, mask_bias, k, tile_q, tile_g, interpret, compute_dtype, algorithm,
            out_vma, precision,
        )
        d = queries.shape[-1]
        # -(d - (-inf)) / 2 == -inf: the padding markers survive the affine
        # transform, so no extra masking is needed here
        return -(d - vals) / 2.0, idxs
    raise ValueError(f"unknown metric {metric!r}")


def fused_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    tile_q: int = 512,
    tile_g: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    algorithm: str = "auto",
    precision: str = None,
):
    """Metric-aware fused exact top-K (drop-in for ops.topk.tiled_topk).

    The no-mask form of ``fused_topk_masked``: with ``valid_count`` equal
    to the static gallery length the mask bias constant-folds to the same
    all-zero bias this function used to build, and the -inf guards on the
    l2 path are no-ops (nothing is masked, k <= n yields finite scores)."""
    return fused_topk_masked(
        queries, gallery, k, gallery.shape[0], metric,
        tile_q, tile_g, interpret, compute_dtype, algorithm,
        precision=precision,
    )
