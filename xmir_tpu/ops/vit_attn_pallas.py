"""Pallas TPU kernel: fused single-pass attention for plain ViT towers.

The stock Pallas flash kernel tops out ~43 TFLOP/s on the DINOv2 shape
(B16 H12 N1370 D64) regardless of block sizes — its online-softmax
bookkeeping and f32 carry cost dominate at these modest sequence lengths.
But a whole (N, D) K/V pane for one head is only ~180 KB at bf16: it fits
in VMEM outright, so no online softmax is needed at all. This kernel runs
the full softmax row in one pass per query tile — one MXU dot for the
scores, f32 softmax in VMEM, one MXU dot for the values — the same design
as ops/window_attn_pallas.py, which took SwinV2 3x past its XLA path.

Layout: the caller folds (batch, heads) into one leading axis,
  q, k, v : (BH, N, D)
and the grid (BH/bb, T) keeps each head's K/V pane resident across all its
query tiles (the tile axis varies fastest; the K/V index map ignores it).
Query rows are padded to the tile size (their garbage outputs are sliced
off); zero-padded key columns need NO masking pass — they score exactly 0
and their denominator contribution is removed analytically (see _kernel),
so real-row outputs are exact.

Backward (round 3): jax.custom_vjp whose bf16-on-TPU path is a single-pass
Pallas backward with the same residency plan (_bwd_kernel for the plain
towers, _bwd_kernel_biased for SwinV2's grouped-bias/cosine variant —
whole-window tiles only). f32 inputs, interpret mode, and non-TPU backends
recompute-and-differentiate the XLA einsum reference instead: exact, and
required by the f32 checkpoint-parity policy. Measured impact and the
kernel-level identities are documented in BENCHMARKS.md ("Train-step
throughput") and DESIGN.md §11.

Reference role: the HF/timm eager attention inside the reference's towers
(model.py:448-533); behavior identical to softmax(qk^T * scale) @ v.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634  # softmax in exp2 space: exp(x) == exp2(x*log2e)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_bwd_enabled() -> bool:
    """Backward-only kill switch: XMIR_PALLAS_BWD=0 routes custom-vjp
    backwards to the exact XLA-recompute path WITHOUT disabling the proven
    fused forwards (the forward flags XMIR_FLASH_ATTN/XMIR_FUSED_ATTN/
    XMIR_FUSED_MLP kill both directions). Escape hatch for a misreported
    backend (the axon plugin says 'tpu' on virtual meshes) or a suspect
    bwd kernel. Read at trace time, like the forward gates."""
    import os

    return os.environ.get("XMIR_PALLAS_BWD", "1") != "0"


def _fold_cap() -> int:
    """Rows folded per grid step. <=8 unrolls (best pipelining); >8 switches
    _row_loop to a rolled lax.fori_loop (compiles flat, reuses one score
    buffer). Measured on v5e: rolled 16 loses 6% on the SwinV2 shape (390
    vs 415 img/s) and rolled 16/24 lose ~4% on DINOv2 (316/315 vs 330) —
    the unroll's cross-row MXU/VPU overlap beats the fewer grid steps, so
    8 stays the default; the knob exists to re-measure on new shapes/libtpu.
    Read once per trace: processes that change XMIR_ATTN_FOLD after a shape
    has been jitted keep the cached executable. Clamped to [1, 32]: the vmem
    estimator models the rolled loop's single reused score buffer, and an
    unvalidated huge fold could overshoot the scoped-VMEM budget it guards."""
    import os

    return min(max(int(os.environ.get("XMIR_ATTN_FOLD", "8")), 1), 32)


def _row_loop(bb: int, body):
    """Iterate the folded batch*heads rows of one grid step.

    Small folds run as a static Python unroll (Mosaic pipelines the
    per-iteration MXU work best this way). Large folds run as a
    lax.fori_loop: the 2026-08 Mosaic allocates the f32 score buffer once
    per UNROLLED iteration (a 16-row unroll wants 16 live (tq, nk) f32
    buffers -> scoped-VMEM OOM) and its compile time explodes superlinearly
    past ~8 unrolled rows; a rolled loop reuses one buffer and compiles
    flat, which is what lets bb exceed 8 at all."""
    if bb <= 8:
        for i in range(bb):
            body(i)
    else:
        jax.lax.fori_loop(0, bb, lambda i, c: (body(i), c)[1], 0)


def _softmax_bf16_enabled(dtype) -> bool:
    """bf16 softmax tail: one rounding after the score matmul, then
    max/sub/exp2/sum on bf16 vectors and the value dot consumes e without a
    cast pass. MEASURED NEUTRAL on the DINOv2 shape with the 2026-08 Mosaic
    (1.87 vs 1.83 ms — v5e VPU elementwise ops are not 2x-packed for bf16
    through this lowering) at slightly worse error (1.4% vs 1.1% rel), so
    the default stays the f32 tail; the variant is kept behind
    XMIR_ATTN_SOFTMAX_BF16=1 for re-measurement on future libtpu."""
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and os.environ.get("XMIR_ATTN_SOFTMAX_BF16", "0") == "1"
    )


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_pad_extra, scale, sm_bf16=False):
    # q/o blocks (bb, TQ, D); k/v blocks (bb, NK, D). The softmax scale is
    # applied to the (TQ, D) q tile in VMEM — 20x smaller than the score
    # matrix and free of the host-side HBM pass a pre-scale would cost —
    # and log2(e) is folded into it so the softmax runs in exp2 space: the
    # VPU's exp lowers to exp2(x*log2e), and pre-folding the constant into
    # the tiny q tile deletes that full-score-matrix multiply.
    # No key masking pass: zero-padded keys score exactly
    # 0, contribute exp2(-m) each to the denominator (corrected analytically
    # below) and nothing to the value dot (their v rows are zero). rowmax
    # over the padded scores is max(real, 0) >= any real score, so the
    # shifted exp stays stable. Every full-matrix VPU op beyond the one
    # exp2(s - m) is eliminated; normalization is deferred past the value
    # matmul ((e/Z) @ v == (e @ v)/Z) so it touches (TQ, D), not (TQ, NK).
    def body(i):
        q = q_ref[i] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        if sm_bf16:
            # bf16 softmax tail: the MXU emits bf16 scores (f32 accumulate,
            # one rounding at output), and every full-score VPU pass runs
            # packed bf16 — plus the e->bf16 cast pass disappears because e
            # is born bf16 for the value dot. Exactness: s - m <= 0 exactly
            # (m is the max of the SAME bf16 values), so no overflow; the
            # ~2^-8 relative error on softmax weights sits at the output
            # dtype's own rounding level. z accumulates in f32.
            s = jnp.dot(
                q, k_ref[i].T, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)  # Mosaic matmuls accumulate f32; one
            # rounding here replaces the e->bf16 cast pass of the f32 tail
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - m)
            z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            if n_pad_extra:
                # padded keys score exactly 0 -> contribute exp2(-m) each
                z = jnp.maximum(
                    z - n_pad_extra * jnp.exp2(-m.astype(jnp.float32)), 1e-30
                )
            o = jnp.dot(e, v_ref[i], preferred_element_type=jnp.float32)
            o_ref[i] = (o / z).astype(o_ref.dtype)
            return
        s = jnp.dot(q, k_ref[i].T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        if n_pad_extra:
            # floor guards the (unphysical) case of every real logit
            # underflowing exp while the pad contribution dominates z
            z = jnp.maximum(z - n_pad_extra * jnp.exp2(-m), 1e-30)
        o = jnp.dot(
            e.astype(v_ref.dtype), v_ref[i], preferred_element_type=jnp.float32
        )
        o_ref[i] = (o / z).astype(o_ref.dtype)

    _row_loop(q_ref.shape[0], body)


def _choose_tile_q(n: int) -> int:
    """Query tile minimizing padded rows: query rows live on the 8-sublane
    axis, so tq only needs 8-alignment — a divisor of round_up(n, 8) in
    [172, 768] gives near-zero padding (DINOv2's 1370 -> tq 344, nq_pad 1376
    = 0.4% pad, where the old 128-aligned choice padded 12% and burned that
    fraction of every MXU dot and VPU exp). Falls back to the 128-aligned
    ladder when no such divisor exists."""
    n8 = _round_up(n, 8)
    best = None
    for tq in range(768, 171, -8):
        if n8 % tq == 0:
            best = tq
            break
    base = _round_up(n, 128)
    if best is not None:  # n8 <= base always, so a divisor is always taken
        return best
    for tq in (512, 256):
        if _round_up(n, tq) <= 1.15 * base:
            return tq
    return 128


def _choose_nk_pad(n: int) -> int:
    """Key-axis padding: MXU/VPU ops over 512-multiple minor dims measurably
    beat ragged 128-multiples (1536 vs 1408: -8% despite +9% padded FLOPs on
    the DINOv2 shape), so round up to the coarsest multiple whose overhead
    stays under ~15%."""
    base = _round_up(n, 128)
    for m in (512, 256):
        if _round_up(n, m) <= 1.15 * base:
            return _round_up(n, m)
    return base


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _attention_fwd_pallas(q, k, v, sm_scale: float, interpret: bool = False):
    bh, n, d = q.shape
    if n <= 768 and n % 8 == 0:
        # one unpadded whole-sequence tile (see _biased_fwd_pallas)
        nk_pad = nq_pad = tq = n
    else:
        nk_pad = _choose_nk_pad(n)
        tq = nk_pad if nk_pad <= 768 else _choose_tile_q(n)
        nq_pad = _round_up(n, tq)

    # fold as many heads per grid step as the scoped-VMEM limit allows. VMEM
    # lays the minor dim out in 128-lane tiles, so head_dim < 128 still
    # occupies full lanes — size with the padded width. The in-kernel head
    # loop is unrolled and the 2026-08 libtpu's Mosaic keeps roughly one
    # pipelined f32 score buffer live PER unrolled iteration (24 folded
    # heads on the DINOv2 shape wanted 106MB ~= panes + qo + 24 x 1.2
    # score buffers of the 96MB scoped limit), so charge ~1.5 (tq, nk) f32
    # buffers per row as pipelining allowance.
    itemsize = jnp.dtype(q.dtype).itemsize
    d_eff = _round_up(d, 128)

    def vmem_est(bb):
        panes = 2 * 2 * bb * nk_pad * d_eff * itemsize  # double-buffered k+v
        qo = 2 * 2 * bb * tq * d_eff * itemsize
        # unrolled rows each keep a live f32 score buffer; the rolled
        # (>8-row) loop reuses one (+1 as pipelining allowance)
        rows = bb if bb <= 8 else 2
        scores = int(1.5 * tq * nk_pad * 4) * rows
        return panes + qo + scores

    bb = min(bh, _fold_cap())
    while bb > 1 and vmem_est(bb) > 84 * 1024 * 1024:
        bb -= 1
    while bh % bb:
        bb -= 1

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - n), (0, 0))) if nq_pad != n else q
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else k
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else v

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_pad_extra=nk_pad - n, scale=sm_scale,
            sm_bf16=_softmax_bf16_enabled(q.dtype),
        ),
        grid=(bh // bb, nq_pad // tq),
        in_specs=[
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq_pad * nk_pad * d,
            bytes_accessed=4 * bh * n * d * itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n]


def _kernel_biased(
    q_ref, k_ref, v_ref, b_ref, s_ref, o_ref, *, n_pad_extra, cosine,
    bb, g_size, n_groups
):
    # Same one-pass exp2-space softmax as _kernel plus an additive bias block
    # shared by every row of the grid step (grouped CPB bias + shift mask for
    # Swin) and a per-group logit scale scalar (SwinV2's learned temperature).
    # The caller pre-scales the bias by log2(e) (one fused multiply on the
    # small (G, N, N) table) and log2(e) folds into the q scale here, so exp2
    # replaces exp with no full-score-matrix multiply.
    # With cosine=True, q/k rows are L2-normalized in VMEM — SwinV2's
    # cosine attention without the 5 host-side HBM passes (2 norms, scale,
    # and their writebacks) the XLA prologue spent.
    # The bias is zero-padded, so padded keys still contribute exactly
    # exp2(-m) to the denominator and the analytic correction holds.
    bias = b_ref[0]
    # the (G, 1) scale table rides whole in SMEM; pick this step's group
    g = (pl.program_id(0) * bb // g_size) % n_groups
    sc = s_ref[g, 0] * LOG2E

    def body(i):
        if cosine:
            qf = q_ref[i].astype(jnp.float32)
            kf = k_ref[i].astype(jnp.float32)
            qf = qf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(qf * qf, axis=-1, keepdims=True), 1e-24)
            )
            kf = kf * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(kf * kf, axis=-1, keepdims=True), 1e-24)
            )
            q = (qf * sc).astype(q_ref.dtype)
            k = kf.astype(k_ref.dtype)
        else:
            q = q_ref[i] * sc.astype(q_ref.dtype)
            k = k_ref[i]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        if n_pad_extra:
            z = jnp.maximum(z - n_pad_extra * jnp.exp2(-m), 1e-30)
        o = jnp.dot(
            e.astype(v_ref.dtype), v_ref[i], preferred_element_type=jnp.float32
        )
        o_ref[i] = (o / z).astype(o_ref.dtype)

    _row_loop(q_ref.shape[0], body)


@functools.partial(
    jax.jit, static_argnames=("g_size", "cosine", "interpret")
)
def _biased_fwd_pallas(q, k, v, bias, scale, g_size, cosine, interpret=False):
    """Grouped-bias forward: row i of the folded (BH, N, D) batch uses bias
    slice ((i // g_size) % G) and logit scale scale[(i // g_size) % G].
    Fold order must place the group axis major and the g_size-sized shared
    axis minor (Swin: (heads, windows, batch))."""
    bh, n, d = q.shape
    G = bias.shape[0]
    if n <= 768 and n % 8 == 0:
        # whole-window tile, no padding at all: Mosaic masks the ragged
        # minor dim internally (576 beats a 640 pad by the full 23% extra
        # score-matrix work the padding would cost)
        nk_pad = nq_pad = tq = n
    else:
        nk_pad = _choose_nk_pad(n)
        tq = nk_pad if nk_pad <= 768 else _choose_tile_q(n)
        nq_pad = _round_up(n, tq)
    itemsize = jnp.dtype(q.dtype).itemsize
    d_eff = _round_up(d, 128)  # VMEM lane padding, see _attention_fwd_pallas

    def vmem_est(bb):
        panes = 2 * 2 * bb * nk_pad * d_eff * itemsize
        qo = 2 * 2 * bb * tq * d_eff * itemsize
        rows = bb if bb <= 8 else 2  # see _attention_fwd_pallas
        scores = int(1.5 * tq * nk_pad * 4) * rows
        bias_blk = 2 * tq * nk_pad * 4
        return panes + qo + scores + bias_blk

    bb = min(g_size, bh, _fold_cap())  # one bias group per grid step
    while bb > 1 and vmem_est(bb) > 84 * 1024 * 1024:
        bb -= 1
    while g_size % bb or bh % bb:
        bb -= 1

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - n), (0, 0))) if nq_pad != n else q
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else k
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else v
    # bias pre-scaled by log2(e): the kernel's softmax runs in exp2 space
    bp = jnp.pad(
        bias.astype(jnp.float32) * LOG2E,
        ((0, 0), (0, nq_pad - n), (0, nk_pad - n)),
    )
    sp = scale.astype(jnp.float32).reshape(G, 1)

    def group_idx(b, t, bb=bb, g_size=g_size, G=G):
        return ((b * bb // g_size) % G, t, 0)

    out = pl.pallas_call(
        functools.partial(
            _kernel_biased, n_pad_extra=nk_pad - n, cosine=cosine,
            bb=bb, g_size=g_size, n_groups=G,
        ),
        grid=(bh // bb, nq_pad // tq),
        in_specs=[
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, nk_pad), group_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq_pad * nk_pad * d,
            bytes_accessed=4 * bh * n * d * itemsize + G * n * n * 4,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, bp, sp)
    return out[:, :n]


def _bwd_kernel_biased(
    q_ref, k_ref, v_ref, b_ref, s_ref, o_ref, g_ref,
    dq_ref, dk_ref, dv_ref, db_ref, da_ref, *, cosine, bb, g_size, n_groups,
):
    # Whole-window (T==1, unpadded) backward for the grouped-bias kernel.
    # Same identities as _bwd_kernel plus the Swin-specific chains:
    #   * dbias_g = sum over the group's rows of ds = t/z — accumulated in
    #     the resident (1, N, N) f32 block across the group's contiguous
    #     grid steps (zeroed at each group's first step);
    #   * dscale falls out FREE of the cosine chain's alpha term:
    #     rowsum(dqhat*qhat) == scale * rowsum(ds*(qhat khat^T)), so
    #     dscale_g = sum(alpha)/scale_g — the kernel emits one alpha total
    #     per folded row and the wrapper segment-sums it; no extra
    #     full-score pass;
    #   * cosine q/k normalization backward: dq = (dqhat - qhat*alpha)/|q|
    #     on the small (N, D) tiles (exact for the non-degenerate norms the
    #     forward's 1e-12 floor never clips).
    # One full-score VPU pass more than the plain backward (s2 = s_cos *
    # scale + bias cannot fold the scale into q because s_cos is needed raw
    # for nothing — only alpha — so it's just the bias add at fwd parity).
    b_idx = pl.program_id(0)

    @pl.when(b_idx * bb % g_size == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    g = (b_idx * bb // g_size) % n_groups
    sc = s_ref[g, 0]
    bias = b_ref[0]

    def body(i):
        if cosine:
            qf = q_ref[i].astype(jnp.float32)
            kf = k_ref[i].astype(jnp.float32)
            qinv = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(qf * qf, axis=-1, keepdims=True), 1e-24)
            )
            kinv = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(kf * kf, axis=-1, keepdims=True), 1e-24)
            )
            qh32, kh32 = qf * qinv, kf * kinv
            qh = qh32.astype(q_ref.dtype)
            kh = kh32.astype(k_ref.dtype)
        else:
            qh, kh = q_ref[i], k_ref[i]
            qh32 = qh.astype(jnp.float32)
        s_cos = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
        s2 = s_cos * (sc * LOG2E) + bias
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp2(s2 - m)
        zinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        g32 = g_ref[i].astype(jnp.float32)
        c = jnp.sum(g32 * o_ref[i].astype(jnp.float32), axis=-1, keepdims=True)
        dp = jnp.dot(g_ref[i], v_ref[i].T, preferred_element_type=jnp.float32)
        t = e * (dp - c)
        tb = t.astype(q_ref.dtype)
        db_ref[0] += t * zinv
        dqh = jnp.dot(tb, kh, preferred_element_type=jnp.float32) * (sc * zinv)
        alpha = jnp.sum(dqh * qh32, axis=-1, keepdims=True)
        da_ref[i] = jnp.broadcast_to(jnp.sum(alpha), da_ref.shape[1:])
        if cosine:
            dq_ref[i] = ((dqh - qh32 * alpha) * qinv).astype(dq_ref.dtype)
        else:
            dq_ref[i] = dqh.astype(dq_ref.dtype)
        qz = (qh32 * (sc * zinv)).astype(q_ref.dtype)
        dkh = jnp.dot(tb.T, qz, preferred_element_type=jnp.float32)
        if cosine:
            beta = jnp.sum(dkh * kh32, axis=-1, keepdims=True)
            dk_ref[i] = ((dkh - kh32 * beta) * kinv).astype(dk_ref.dtype)
        else:
            dk_ref[i] = dkh.astype(dk_ref.dtype)
        gz = (g32 * zinv).astype(g_ref.dtype)
        dv_ref[i] = jnp.dot(
            e.astype(q_ref.dtype).T, gz, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)

    _row_loop(q_ref.shape[0], body)


def _biased_bwd_eligible(n: int, bh: int, G: int, g_size: int) -> bool:
    """Whole-window tiles only (no q/k padding, no cross-tile dk/dv
    accumulation) and EXACTLY one contiguous run of rows per group: with
    bh < G*g_size a trailing group gets zero grid steps, so its dbias
    output block would never be zero-initialized (uninitialized HBM as
    gradient); with bh > G*g_size groups wrap and revisit their dbias
    block non-consecutively. Swin's folds always satisfy equality."""
    return n <= 768 and n % 8 == 0 and bh == G * g_size


@functools.partial(jax.jit, static_argnames=("g_size", "cosine", "interpret"))
def _biased_bwd_pallas(q, k, v, bias, scale, o, g, g_size, cosine,
                       interpret=False):
    """Returns (dq, dk, dv, dbias, dscale) for the grouped-bias attention.
    Caller must have checked _biased_bwd_eligible."""
    bh, n, d = q.shape
    G = bias.shape[0]
    itemsize = jnp.dtype(q.dtype).itemsize
    d_eff = _round_up(d, 128)

    def vmem_est(bb):
        tiles = 2 * 8 * bb * n * d_eff * itemsize  # q,k,v,o,g,dq,dk,dv
        rows = bb if bb <= 8 else 2
        scores = int(4.5 * n * n * 4) * rows       # s_cos, e, dp, t
        bias_blks = 2 * 2 * n * n * 4              # bias in + dbias out
        return tiles + scores + bias_blks

    bb = min(g_size, bh, _fold_cap())
    while bb > 1 and vmem_est(bb) > 84 * 1024 * 1024:
        bb -= 1
    while g_size % bb or bh % bb:
        bb -= 1

    bp = bias.astype(jnp.float32) * LOG2E
    sp = scale.astype(jnp.float32).reshape(G, 1)

    def group_idx(b, t, bb=bb, g_size=g_size, G=G):
        return ((b * bb // g_size) % G, t, 0)

    dq, dk, dv, dbias, alpha = pl.pallas_call(
        functools.partial(
            _bwd_kernel_biased, cosine=cosine, bb=bb, g_size=g_size,
            n_groups=G,
        ),
        grid=(bh // bb, 1),
        in_specs=[
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), group_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), group_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 8, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
            jax.ShapeDtypeStruct((G, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bh, 8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * d,
            bytes_accessed=9 * bh * n * d * itemsize + 2 * G * n * n * 4,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(q, k, v, bp, sp, o, g)

    gidx = (jnp.arange(bh) // g_size) % G
    dscale = (
        jax.ops.segment_sum(alpha[:, 0, 0], gidx, num_segments=G)
        / scale.astype(jnp.float32).reshape(G)
    )
    return (
        dq, dk, dv,
        dbias.astype(bias.dtype),
        dscale.reshape(scale.shape).astype(scale.dtype),
    )


def _biased_reference(q, k, v, bias, scale, g_size, cosine):
    bh = q.shape[0]
    G = bias.shape[0]
    gidx = (jnp.arange(bh) // g_size) % G
    bias_full = bias[gidx]
    scale_full = scale.reshape(G)[gidx][:, None, None]
    if cosine:
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale_full + bias_full, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def biased_attention_fused(
    q, k, v, bias, scale, g_size: int = 1, cosine: bool = False,
    interpret: bool = False,
):
    """softmax(norm(q) @ norm(k)^T * scale_g + bias_g) @ v, fused.

    q/k/v: (BH, N, D); bias: (G, N, N) f32; scale: (G,) or (G, 1) logit
    scales; row i uses group (i // g_size) % G. cosine=True L2-normalizes
    q/k rows in VMEM (SwinV2 cosine attention). Serves SwinV2's window
    attention (fold order (heads, windows, batch), bias = CPB + shift
    mask); reference swin towers / timm SwinTransformerV2."""
    return _biased_fwd_pallas(q, k, v, bias, scale, g_size, cosine, interpret)


def _bfwd(q, k, v, bias, scale, g_size, cosine, interpret):
    out = _biased_fwd_pallas(q, k, v, bias, scale, g_size, cosine, interpret)
    return out, (q, k, v, bias, scale, out)


def _bbwd(g_size, cosine, interpret, res, g):
    """Same policy as the plain kernel's _bwd: on TPU with bf16 inputs run
    the single-pass Pallas backward (SwinV2's XLA-recompute backward
    materializes (heads*windows*B, N, N) f32 probs per layer); f32 and
    non-TPU keep the exact XLA vjp. Shapes outside the whole-window/
    contiguous-group envelope (never produced by the Swin models) also
    fall back."""
    q, k, v, bias, scale, out = res
    if (not interpret and pallas_bwd_enabled()
            and jax.default_backend() == "tpu"
            and q.dtype == jnp.bfloat16
            and _biased_bwd_eligible(q.shape[1], q.shape[0], bias.shape[0],
                                     g_size)):
        return _biased_bwd_pallas(q, k, v, bias, scale, out, g, g_size, cosine)
    _, vjp = jax.vjp(
        lambda q, k, v, bias, scale: _biased_reference(
            q, k, v, bias, scale, g_size, cosine
        ),
        q, k, v, bias, scale,
    )
    return vjp(g)


biased_attention_fused.defvjp(_bfwd, _bbwd)


def _attention_reference(q, k, v, sm_scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * sm_scale, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, n_pad_extra, scale):
    # Single-pass attention backward, same residency plan as _kernel: whole
    # K/V panes live in VMEM across the query tiles of one head. Let
    # p = softmax(sigma*q k^T), dp = g v^T, c = rowsum(p*dp). Then
    #   dv = p^T g,  ds = p*(dp - c),  dq = sigma*ds@k,  dk = sigma*ds^T@q.
    # Tricks that keep VPU work at two full-score passes (exp2 and one fused
    # multiply-subtract), mirroring the forward's zero-masking design:
    #   * c == rowsum(g*o) over the head dim (p v == o), so the saved forward
    #     output turns a (tq, nk) reduction into a (tq, d) one;
    #   * 1/z never touches the score matrix: p = e/z factors out of every
    #     product, so z folds into the SMALL side of each matmul —
    #     dq = (t@k)*(sigma/z) rowwise, dk += t^T(q*sigma/z), dv += e^T(g/z),
    #     with t = e*(dp - c);
    #   * no masking: zero-padded k/v rows make dp's pad columns and dq's
    #     pad-column contributions exactly 0; zero-padded g rows make the
    #     pad-row ds/dv contributions 0; garbage dq/dk/dv pad rows are
    #     sliced off by the wrapper; z is pad-corrected analytically as in
    #     the forward.
    # dk/dv accumulate in f32 VMEM across the query-tile grid axis (their
    # index map ignores t, so the block stays resident; t iterates fastest).
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    def body(i):
        qs = q_ref[i] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        s = jnp.dot(qs, k_ref[i].T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        if n_pad_extra:
            z = jnp.maximum(z - n_pad_extra * jnp.exp2(-m), 1e-30)
        zinv = 1.0 / z
        g32 = g_ref[i].astype(jnp.float32)
        c = jnp.sum(g32 * o_ref[i].astype(jnp.float32), axis=-1, keepdims=True)
        dp = jnp.dot(g_ref[i], v_ref[i].T, preferred_element_type=jnp.float32)
        t = (e * (dp - c)).astype(q_ref.dtype)
        eb = e.astype(q_ref.dtype)
        dq = jnp.dot(t, k_ref[i], preferred_element_type=jnp.float32)
        dq_ref[i] = (dq * (scale * zinv)).astype(dq_ref.dtype)
        qz = (q_ref[i].astype(jnp.float32) * (scale * zinv)).astype(q_ref.dtype)
        gz = (g32 * zinv).astype(g_ref.dtype)
        dk_ref[i] += jnp.dot(t.T, qz, preferred_element_type=jnp.float32)
        dv_ref[i] += jnp.dot(eb.T, gz, preferred_element_type=jnp.float32)

    _row_loop(q_ref.shape[0], body)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _attention_bwd_pallas(q, k, v, o, g, sm_scale: float, interpret: bool = False):
    """Returns (dq, dk, dv) for out = softmax(sm_scale * q k^T) @ v given the
    saved forward output o and the cotangent g. Tiling mirrors
    _attention_fwd_pallas; dk/dv accumulate f32 and are cast to input dtype."""
    bh, n, d = q.shape
    if n <= 768 and n % 8 == 0:
        nk_pad = nq_pad = tq = n
    else:
        nk_pad = _choose_nk_pad(n)
        tq = nk_pad if nk_pad <= 768 else _choose_tile_q(n)
        nq_pad = _round_up(n, tq)

    itemsize = jnp.dtype(q.dtype).itemsize
    d_eff = _round_up(d, 128)

    def vmem_est(bb):
        panes = 2 * 2 * bb * nk_pad * d_eff * itemsize        # k + v
        tiles = 2 * 4 * bb * tq * d_eff * itemsize            # q, o, g, dq
        accums = 2 * 2 * bb * nk_pad * d_eff * 4              # dk + dv f32
        rows = bb if bb <= 8 else 2
        scores = int(3.0 * tq * nk_pad * 4) * rows            # e, dp, t
        return panes + tiles + accums + scores

    bb = min(bh, _fold_cap())
    while bb > 1 and vmem_est(bb) > 84 * 1024 * 1024:
        bb -= 1
    while bh % bb:
        bb -= 1

    def padq(t):  # query-axis padding (g MUST zero-pad for exactness)
        return jnp.pad(t, ((0, 0), (0, nq_pad - n), (0, 0))) if nq_pad != n else t

    def padk(t):
        return jnp.pad(t, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else t

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n_pad_extra=nk_pad - n, scale=sm_scale),
        grid=(bh // bb, nq_pad // tq),
        in_specs=[
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, tq, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * nq_pad * nk_pad * d,
            bytes_accessed=9 * bh * n * d * itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(padq(q), padk(k), padk(v), padq(o), padq(g))
    return (
        dq[:, :n],
        dk[:, :n].astype(k.dtype),
        dv[:, :n].astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def vit_attention_fused(q, k, v, sm_scale: float, interpret: bool = False):
    """softmax(q @ k^T * sm_scale) @ v, fused. q/k/v: (BH, N, D)."""
    return _attention_fwd_pallas(q, k, v, sm_scale, interpret)


def _fwd(q, k, v, sm_scale, interpret):
    # The forward output rides the residuals unconditionally; paths that take
    # the XLA-recompute backward (f32 train, non-TPU, XMIR_PALLAS_BWD=0)
    # carry an unused (BH, N, D) tensor per layer — accepted: those configs
    # are parity/debug paths, not the bf16 production train step.
    out = _attention_fwd_pallas(q, k, v, sm_scale, interpret)
    return out, (q, k, v, out)


def _bwd(sm_scale, interpret, res, g):
    """On TPU with bf16 inputs the backward runs the single-pass Pallas
    kernel above (the dominant train-step cost once the forward is fused:
    differentiating the XLA einsum reference materializes ~720 MB of f32
    scores per layer at DINOv2 train batch 8, and even the stock flash
    bwd kernels run 6.6x the fused forward). f32 inputs and non-TPU
    backends keep the exact XLA recompute path (the Pallas kernels run
    bf16 MXU passes — ~2e-3 rel error on f32 grads, unacceptable for the
    f32 bit-parity policy; tests exercise the bwd kernel via interpret
    mode through _attention_bwd_pallas directly)."""
    q, k, v, out = res
    if (not interpret and pallas_bwd_enabled()
            and jax.default_backend() == "tpu"
            and q.dtype == jnp.bfloat16):
        return _attention_bwd_pallas(q, k, v, out, g, sm_scale)
    _, vjp = jax.vjp(lambda q, k, v: _attention_reference(q, k, v, sm_scale), q, k, v)
    return vjp(g)


vit_attention_fused.defvjp(_fwd, _bwd)
