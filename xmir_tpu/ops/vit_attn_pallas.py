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
Query rows are padded to the tile size (masked rows produce garbage that is
sliced off); key columns are padded to the 128-lane and masked to -inf
before the softmax, so real-row outputs are exact.

Backward: jax.custom_vjp with an XLA-recompute backward (differentiate the
reference einsum attention). Serving/eval take the kernel; the train step's
backward runs the standard XLA path — exact, and training these towers is
never the serving hot path.

Reference role: the HF/timm eager attention inside the reference's towers
(model.py:448-533); behavior identical to softmax(qk^T * scale) @ v.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_pad_extra, scale):
    # q/o blocks (bb, TQ, D); k/v blocks (bb, NK, D). The softmax scale is
    # applied to the (TQ, D) q tile in VMEM — 20x smaller than the score
    # matrix and free of the host-side HBM pass a pre-scale would cost.
    # No key masking pass: zero-padded keys score exactly
    # 0, contribute exp(-m) each to the denominator (corrected analytically
    # below) and nothing to the value dot (their v rows are zero). rowmax
    # over the padded scores is max(real, 0) >= any real score, so the
    # shifted exp stays stable. Every full-matrix VPU op beyond the one
    # exp(s - m) is eliminated; normalization is deferred past the value
    # matmul ((e/Z) @ v == (e @ v)/Z) so it touches (TQ, D), not (TQ, NK).
    for i in range(q_ref.shape[0]):  # static unroll over folded batch*heads
        q = q_ref[i] * jnp.asarray(scale, q_ref.dtype)
        s = jnp.dot(q, k_ref[i].T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        if n_pad_extra:
            # floor guards the (unphysical) case of every real logit
            # underflowing exp while the pad contribution dominates z
            z = jnp.maximum(z - n_pad_extra * jnp.exp(-m), 1e-30)
        o = jnp.dot(
            e.astype(v_ref.dtype), v_ref[i], preferred_element_type=jnp.float32
        )
        o_ref[i] = (o / z).astype(o_ref.dtype)


def _choose_tile_q(n: int) -> int:
    """Largest query tile whose row padding stays near the 128-multiple
    minimum: big tiles amortize grid overhead, padded rows burn real MXU
    work (e.g. 729 -> tq 256 pads to 768, not 1024)."""
    base = _round_up(n, 128)
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
    tq = _choose_tile_q(n)
    nq_pad = _round_up(n, tq)
    nk_pad = _choose_nk_pad(n)

    # fold as many heads per grid step as a ~28MB working set allows
    itemsize = jnp.dtype(q.dtype).itemsize

    def vmem_est(bb):
        panes = 2 * 2 * bb * nk_pad * d * itemsize  # double-buffered k+v
        qo = 2 * 2 * bb * tq * d * itemsize
        scores = 3 * tq * nk_pad * 4
        return panes + qo + scores

    bb = bh
    while bb > 1 and vmem_est(bb) > 28 * 1024 * 1024:
        bb = max(1, bb // 2)
    while bh % bb:
        bb -= 1

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - n), (0, 0))) if nq_pad != n else q
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else k
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else v

    out = pl.pallas_call(
        functools.partial(_kernel, n_pad_extra=nk_pad - n, scale=sm_scale),
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


def _attention_reference(q, k, v, sm_scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * sm_scale, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def vit_attention_fused(q, k, v, sm_scale: float, interpret: bool = False):
    """softmax(q @ k^T * sm_scale) @ v, fused. q/k/v: (BH, N, D)."""
    return _attention_fwd_pallas(q, k, v, sm_scale, interpret)


def _fwd(q, k, v, sm_scale, interpret):
    return _attention_fwd_pallas(q, k, v, sm_scale, interpret), (q, k, v)


def _bwd(sm_scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _attention_reference(q, k, v, sm_scale), q, k, v)
    return vjp(g)


vit_attention_fused.defvjp(_fwd, _bwd)
