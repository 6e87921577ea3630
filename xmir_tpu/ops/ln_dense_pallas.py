"""Pallas TPU kernels: LayerNorm fused into the following projection.

The plain-ViT block profile (BENCHMARKS.md round-3 DINOv2 decomposition)
shows the two pre-LNs + residuals streaming (B, N, C) activations through
HBM at ~400 GB/s between matmuls, and the packed qkv projection running at
115 TF/s — XLA lowers `einsum("bnc,cthd->tbhnd")` with a strided head-major
output write and keeps LayerNorm as its own fusion with a full HBM
round-trip of the normed tensor. These kernels read the residual-stream
tile once, LayerNorm it in VMEM registers (f32), and feed the MXU straight
from VMEM with the projection weight resident across all grid steps:

  ln_qkv_fused   x (B, N, C) -> q, k, v each (B, H, N, hd), head-major
                 (the layout ops/vit_attn_pallas.py consumes after a free
                 reshape) — the (tile_n, H, hd) -> (H, tile_n, hd) transpose
                 happens on VMEM tiles, not as an HBM pass.
  ln_dense_fused x (R, C) -> (R, M), optional tanh-GELU epilogue (the Mlp
                 fc1; the GELU form bf16-exact per the convnext kernel note).

Both are bf16-gated like every kernel here (f32 keeps the exact XLA path
for converted-checkpoint parity; tanh-GELU error ~1e-3 sits below bf16's
2^-8 rounding). ln_qkv's backward is analytic (2 matmuls + closed-form LN
chain; the round-3 recompute vjp paid a third, strided qkv einsum to
rebuild the linearization). ln_dense keeps the XLA-recompute vjp: its only
fused call site is the fc1 GELU path, where the GELU derivative needs the
pre-activation back — recomputing it IS the matmul, so analytic saves
nothing there (and the fc1 fusion defaults off, models/vit.py).

Reference role: the torch pre-LN transformer blocks inside the HF towers
the reference loads (model.py:448-533); behavior identical to
LayerNorm -> Linear (-> GELU).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_ln_enabled(dtype) -> bool:
    """bf16 on TPU only; XMIR_FUSED_LN overrides (0/1)."""
    flag = os.environ.get("XMIR_FUSED_LN", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"


def _ln_rows(x32, lns, lnb, eps):
    """(R, C) f32 rows -> LayerNorm'd f32 rows."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * lns + lnb


def _ln_dense_reference(x, lns, lnb, w, b, eps, act):
    y = _ln_rows(x.astype(jnp.float32), lns.astype(jnp.float32),
                 lnb.astype(jnp.float32), eps).astype(x.dtype)
    out = jnp.dot(y, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    if act == "gelu":
        out = jax.nn.gelu(out, approximate=True)
    return out.astype(x.dtype)


def _ln_dense_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, *, eps, act):
    y = _ln_rows(x_ref[...].astype(jnp.float32), lns_ref[0], lnb_ref[0], eps)
    out = jnp.dot(y.astype(x_ref.dtype), w_ref[...],
                  preferred_element_type=jnp.float32) + b_ref[0]
    if act == "gelu":
        out = jax.nn.gelu(out, approximate=True)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def ln_dense_fused(x, lns, lnb, w, b, eps: float = 1e-6, act: str = "",
                   tile_r: int = 256, interpret: bool = False):
    """LayerNorm(x) @ w + b (optionally -> tanh-GELU). x (R, C) -> (R, M)."""
    return _ln_dense_pallas(x, lns, lnb, w, b, eps, act, tile_r, interpret)


@functools.partial(jax.jit, static_argnames=("eps", "act", "tile_r", "interpret"))
def _ln_dense_pallas(x, lns, lnb, w, b, eps, act, tile_r, interpret):
    r, c = x.shape
    m = w.shape[1]
    r_pad = -(-r // tile_r) * tile_r
    if r_pad != r:
        x = jnp.pad(x, ((0, r_pad - r), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps, act=act),
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_r, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, m), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * c * m,
            bytes_accessed=(r_pad * c + r_pad * m) * x.dtype.itemsize
            + c * m * w.dtype.itemsize,
            transcendentals=r_pad * (m if act == "gelu" else 0),
        ),
        interpret=interpret,
    )(
        x,
        lns.reshape(1, c).astype(jnp.float32),
        lnb.reshape(1, c).astype(jnp.float32),
        w.astype(x.dtype),
        (b if b is not None else jnp.zeros((m,))).reshape(1, m).astype(jnp.float32),
    )
    return out[:r]


def _ln_dense_fwd(x, lns, lnb, w, b, eps, act, tile_r, interpret):
    return (
        _ln_dense_pallas(x, lns, lnb, w, b, eps, act, tile_r, interpret),
        (x, lns, lnb, w, b),
    )


def _ln_dense_bwd(eps, act, tile_r, interpret, res, g):
    x, lns, lnb, w, b = res
    has_b = b is not None
    def ref(x, lns, lnb, w, b):
        return _ln_dense_reference(x, lns, lnb, w, b if has_b else None, eps, act)
    _, vjp = jax.vjp(ref, x, lns, lnb, w,
                     b if has_b else jnp.zeros((w.shape[1],), x.dtype))
    dx, dlns, dlnb, dw, db = vjp(g)
    return dx, dlns, dlnb, dw, (db if has_b else None)


ln_dense_fused.defvjp(_ln_dense_fwd, _ln_dense_bwd)


def _ln_qkv_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref,
                   q_ref, k_ref, v_ref, *, eps, heads, head_dim):
    y = _ln_rows(x_ref[0].astype(jnp.float32), lns_ref[0], lnb_ref[0], eps)
    out = jnp.dot(y.astype(x_ref.dtype), w_ref[...],
                  preferred_element_type=jnp.float32) + b_ref[0]
    c = heads * head_dim
    out = out.astype(q_ref.dtype)
    # VMEM-local relayout: head-major so the caller's (B*H, N, hd) fold for
    # the attention kernel is a free reshape (no HBM transpose pass). Mosaic
    # cannot shape-cast the lane dim (C -> H x hd), so the split is unrolled
    # as static per-head lane slices.
    for ref, part in zip((q_ref, k_ref, v_ref), range(3)):
        for h in range(heads):
            off = part * c + h * head_dim
            ref[0, h] = out[:, off:off + head_dim]


def _auto_tile(n: int, target: int = 384) -> int:
    """Minimal-padding row tile near the measured sweet spot. DINOv2-shape
    sweep (ms/call): 128 0.644, 256 0.623, 344 **0.559**, 512 0.579,
    688 0.857, 1376 0.943 — throughput peaks in the 344-512 band (beyond
    it the f32 accumulator grows and pipelining collapses to few steps),
    and near-zero padding beats power-of-two rounding (1370 -> 4x344 pads
    6 rows where 3x512 pads 166)."""
    k = -(-n // target)
    return -(-n // (8 * k)) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ln_qkv_fused(x, lns, lnb, w, b, num_heads: int, eps: float = 1e-6,
                 tile_n: int = 0, interpret: bool = False):
    """LayerNorm(x) @ w_qkv, emitted head-major.

    x (B, N, C); w (C, 3C); b (3C,) or None. tile_n=0 picks the
    minimal-padding tile (_auto_tile).
    Returns q, k, v each (B, H, N, hd) in x.dtype."""
    return _ln_qkv_pallas(x, lns, lnb, w, b, num_heads, eps, tile_n, interpret)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "tile_n", "interpret")
)
def _ln_qkv_pallas(x, lns, lnb, w, b, num_heads, eps, tile_n, interpret):
    bsz, n, c = x.shape
    head_dim = c // num_heads
    if not tile_n:
        tile_n = _auto_tile(n)
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    def out_spec():
        return pl.BlockSpec(
            (1, num_heads, tile_n, head_dim), lambda ib, it: (ib, 0, it, 0),
            memory_space=pltpu.VMEM,
        )

    out_shape = jax.ShapeDtypeStruct((bsz, num_heads, n_pad, head_dim), x.dtype)
    q, k, v = pl.pallas_call(
        functools.partial(
            _ln_qkv_kernel, eps=eps, heads=num_heads, head_dim=head_dim
        ),
        grid=(bsz, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec(), out_spec(), out_spec()],
        out_shape=[out_shape, out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_pad * c * 3 * c,
            bytes_accessed=4 * bsz * n_pad * c * x.dtype.itemsize
            + 3 * c * c * w.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        lns.reshape(1, c).astype(jnp.float32),
        lnb.reshape(1, c).astype(jnp.float32),
        w.astype(x.dtype),
        (b if b is not None else jnp.zeros((3 * c,))).reshape(1, 3 * c).astype(
            jnp.float32
        ),
    )
    if n_pad != n:
        q, k, v = q[:, :, :n], k[:, :, :n], v[:, :, :n]
    return q, k, v


def _ln_qkv_reference(x, lns, lnb, w, b, num_heads, eps):
    bsz, n, c = x.shape
    head_dim = c // num_heads
    y = _ln_rows(x.astype(jnp.float32), lns.astype(jnp.float32),
                 lnb.astype(jnp.float32), eps).astype(x.dtype)
    qkv = jnp.einsum(
        "bnc,cthd->tbhnd", y, w.reshape(c, 3, num_heads, head_dim),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        qkv = qkv + b.reshape(3, 1, num_heads, 1, head_dim).astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    return qkv[0], qkv[1], qkv[2]


def _ln_qkv_fwd(x, lns, lnb, w, b, num_heads, eps, tile_n, interpret):
    return (
        _ln_qkv_pallas(x, lns, lnb, w, b, num_heads, eps, tile_n, interpret),
        (x, lns, lnb, w, b),
    )


def _ln_qkv_bwd(num_heads, eps, tile_n, interpret, res, g):
    """Analytic backward: 2 MXU matmuls (dw, dy) + the closed-form
    LayerNorm chain. The round-3 recompute vjp re-ran the forward's
    strided qkv einsum (the slowest matmul in the block profile,
    BENCHMARKS.md) just to rebuild the linearization; here the normed
    rows are recomputed elementwise from the saved residual-stream
    input instead — fwd+bwd drops from 3 to 2 qkv-sized matmuls plus
    one cheap LN pass."""
    x, lns, lnb, w, b = res
    bsz, n, c = x.shape
    gq, gk, gv = g
    # reassemble the head-major cotangents into the packed (B, N, 3C)
    # layout of the projection output: (B,H,N,hd) -> (B,N,H*hd), concat
    # q|k|v along the channel axis (the inverse of the kernel's VMEM
    # relayout)
    gcat = jnp.concatenate(
        [jnp.swapaxes(t, 1, 2).reshape(bsz, n, c) for t in (gq, gk, gv)],
        axis=-1,
    )
    # recompute the normed rows (elementwise; mirrors the forward's f32
    # LN -> cast-to-x.dtype rounding so dw sees the same y the MXU saw)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    y = (xhat * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(
        x.dtype
    )
    db = (
        jnp.sum(gcat.astype(jnp.float32), axis=(0, 1)).astype(b.dtype)
        if b is not None else None
    )
    dw = jnp.einsum(
        "bnc,bnm->cm", y, gcat.astype(y.dtype),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    dy = jnp.einsum(
        "bnm,cm->bnc", gcat, w.astype(gcat.dtype),
        preferred_element_type=jnp.float32,
    )
    dlns = jnp.sum(dy * xhat, axis=(0, 1)).astype(lns.dtype)
    dlnb = jnp.sum(dy, axis=(0, 1)).astype(lnb.dtype)
    dxhat = dy * lns.astype(jnp.float32)
    dx = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dlns, dlnb, dw, db


ln_qkv_fused.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)


def ln_qkv_eligible(c: int, head_dim: int) -> bool:
    """Shapes the qkv kernel's VMEM plan and relayout were validated on:
    lane-tiled channel width and head_dim in {32, 64, 128} (DINOv2/ViT
    family). head_dim=72 (SigLIP SO400M) COMPILES and is chip-correct
    (maxdiff 1.6e-2 = bf16 rounding, tools/profile_ln_qkv72.py), but the
    unaligned 72-lane head slices cost more than the saved LN pass — a
    round-5 MEASURED NEGATIVE: MedSigLIP@448 embed 133.2 img/s fused vs
    138.4 XLA (-4%); isolated kernel 0.263 ms vs 0.185 ms XLA at
    B4 N1024 C1152 H16. Kept behind XMIR_FUSED_LN_QKV72=1 for
    re-measurement on future libtpu (the wiring in models/siglip.py is
    tested either way)."""
    if head_dim == 72:
        return c % 128 == 0 and os.environ.get("XMIR_FUSED_LN_QKV72") == "1"
    return c % 128 == 0 and head_dim in (32, 64, 128)
