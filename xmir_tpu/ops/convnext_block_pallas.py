"""Pallas TPU kernel: fused ConvNeXtV2 MLP + GRN + residual.

The block tail `pw1 -> GELU -> GRN -> pw2 -> +residual` expands activations
4x (e.g. (16, 96, 96, 512) bf16 = 75MB at stage 1) and XLA streams that
tensor through HBM several times (matmul out, gelu, GRN stats pass, GRN
apply, matmul in). GRN's global spatial statistics block any XLA fusion
across the expansion. Per-image the whole expanded tensor fits VMEM, so this
kernel runs the entire tail on-chip: one read of the LN'd input and the
residual, one write of the block output.

GELU uses the tanh form (error ~1e-3, below bf16's 2^-8 rounding step) —
the kernel is only enabled for bf16 compute; float32 runs keep the exact
XLA path for converted-checkpoint parity.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref):
    y = y_ref[0]  # (R, C) LayerNorm'd dwconv output for one image
    h32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h32 = jax.nn.gelu(h32, approximate=True)
    h = h32.astype(y.dtype)  # (R, 4C) expanded tensor lives only in VMEM
    # GRN (models/convnext.py GRN): global L2 over spatial per channel,
    # divided by its channel mean
    gx = jnp.sqrt(
        jnp.sum(h.astype(jnp.float32) ** 2, axis=0, keepdims=True) + 1e-12
    )  # (1, 4C)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    hh = g_ref[:] * (h.astype(jnp.float32) * nx) + be_ref[:] + h.astype(jnp.float32)
    out = jnp.dot(
        hh.astype(y.dtype), w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def convnext_mlp_grn_fused(y, x, w1, b1, w2, b2, gamma, beta,
                           interpret: bool = False):
    """y: (B, R, C) post-LN activations; x: (B, R, C) residual input;
    w1 (C, 4C), w2 (4C, C), b1/gamma/beta (4C,), b2 (C,).
    Returns (B, R, C) block output in x.dtype."""
    b, r, c = y.shape
    c4 = w1.shape[1]

    def img_spec():
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            img_spec(), img_spec(),
            const_spec((c, c4)), const_spec((1, c4)),
            const_spec((c4, c)), const_spec((1, c)),
            const_spec((1, c4)), const_spec((1, c4)),
        ],
        out_specs=img_spec(),
        out_shape=jax.ShapeDtypeStruct((b, r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * r * c * c4,
            bytes_accessed=3 * b * r * c * y.dtype.itemsize,
            transcendentals=b * r * c4,
        ),
        interpret=interpret,
    )(
        y, x, w1,
        b1.reshape(1, c4).astype(jnp.float32),
        w2, b2.reshape(1, c).astype(jnp.float32),
        gamma.reshape(1, c4).astype(jnp.float32),
        beta.reshape(1, c4).astype(jnp.float32),
    )


def _ln_block_kernel(
    h_ref, x_ref, lns_ref, lnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
    o_ref,
):
    # LayerNorm + MLP + GRN + residual for one image, VMEM-resident.
    # (The 7x7 depthwise conv stays on the XLA path: its VPU MACs are
    # near speed-of-light there, and a 49-tap shifted-FMA Pallas version
    # measured SLOWER — sublane-shift relayouts beat the saved HBM pass.)
    # Folding LN here removes its HBM round-trip: one read of the conv
    # output + residual, one write of the block output.
    acc = h_ref[0].astype(jnp.float32)  # (R, C) raw dwconv output
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = (acc - mean) * jax.lax.rsqrt(var + 1e-6)
    y = (y * lns_ref[0] + lnb_ref[0]).astype(x_ref.dtype)

    h32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h32 = jax.nn.gelu(h32, approximate=True)
    h = h32.astype(y.dtype)
    gx = jnp.sqrt(
        jnp.sum(h.astype(jnp.float32) ** 2, axis=0, keepdims=True) + 1e-12
    )
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    hhv = g_ref[:] * (h.astype(jnp.float32) * nx) + be_ref[:] + h.astype(jnp.float32)
    out = jnp.dot(
        hhv.astype(y.dtype), w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _block_fused_fwd(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma, beta,
    interpret: bool = False,
):
    """ConvNeXtV2 block with the dwconv on XLA and everything after it
    (LayerNorm -> pw1 -> GELU -> GRN -> pw2 -> +residual) in one per-image
    Pallas kernel.

    x: (B, H, W, C) block input (also the residual); dw_kernel (7, 7, C);
    dw_bias/ln_scale/ln_bias (C,); w1 (C, 4C), w2 (4C, C), b1/gamma/beta
    (4C,), b2 (C,). Returns (B, H, W, C) in x.dtype.
    Reference role: timm ConvNeXtV2 block (model.py ConvNeXtV2 backbones).
    """
    b, hh, ww, c = x.shape
    c4 = w1.shape[1]
    r = hh * ww

    # the SAME _dwconv the backward differentiates — one definition, so the
    # custom_vjp forward and its vjp cannot silently diverge
    h = _dwconv(x, dw_kernel, dw_bias)

    def img_spec():
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _ln_block_kernel,
        grid=(b,),
        in_specs=[
            img_spec(), img_spec(),
            const_spec((1, c)), const_spec((1, c)),
            const_spec((c, c4)), const_spec((1, c4)),
            const_spec((c4, c)), const_spec((1, c)),
            const_spec((1, c4)), const_spec((1, c4)),
        ],
        out_specs=img_spec(),
        out_shape=jax.ShapeDtypeStruct((b, r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * r * c * c4,
            bytes_accessed=3 * b * r * c * x.dtype.itemsize,
            transcendentals=b * r * c4,
        ),
        interpret=interpret,
    )(
        h.reshape(b, r, c), x.reshape(b, r, c),
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        w1, b1.reshape(1, c4).astype(jnp.float32),
        w2, b2.reshape(1, c).astype(jnp.float32),
        gamma.reshape(1, c4).astype(jnp.float32),
        beta.reshape(1, c4).astype(jnp.float32),
    )
    return out.reshape(b, hh, ww, c)


_K0 = 0.7978845608028654  # sqrt(2/pi), jax approximate-gelu constants
_K1 = 0.044715


def _tail_reference(h, lns, lnb, w1, b1, w2, gamma, beta):
    """jnp replica of the kernel tail (f32 LN -> pw1 -> tanh-GELU -> GRN ->
    pw2, NO residual) with the kernel's dtype/eps semantics — the backward's
    XLA-recompute fallback and the grad-test oracle."""
    acc = h.astype(jnp.float32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = ((acc - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb).astype(h.dtype)
    h32 = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
    a = jax.nn.gelu(h32, approximate=True).astype(h.dtype)
    a32 = a.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(a32 * a32, axis=-2, keepdims=True) + 1e-12)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    z = gamma * (a32 * nx) + beta + a32
    return jnp.dot(z.astype(h.dtype), w2, preferred_element_type=jnp.float32)


def _bwd_tail_kernel(
    h_ref, dy_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref, be_ref,
    dacc_ref, dw1_ref, dw2_ref, db1_ref, dg_ref, dbe_ref, dlns_ref, dlnb_ref,
):
    # Per-image backward of _tail_reference with all intermediates
    # recomputed in VMEM (nothing but h and dy is read from HBM; the param
    # grads accumulate in resident f32 blocks across the image grid).
    # Identities mirror the attention backwards: global GRN statistics are
    # (1, 4C) vectors, so every full-tensor op is one of 5 matmuls, the two
    # GELU transcendental passes, and a handful of fused elementwise passes.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dw1_ref, dw2_ref, db1_ref, dg_ref, dbe_ref, dlns_ref,
                  dlnb_ref):
            r[...] = jnp.zeros_like(r)

    lns, lnb = lns_ref[0], lnb_ref[0]
    gamma, be = g_ref[:], be_ref[:]
    acc = h_ref[0].astype(jnp.float32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-6)
    xhat = (acc - mean) * rstd
    y = (xhat * lns + lnb).astype(h_ref.dtype)
    h1 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    u = _K0 * (h1 + _K1 * h1 * h1 * h1)
    t = jnp.tanh(u)
    ab = (0.5 * h1 * (1.0 + t)).astype(h_ref.dtype)
    ab32 = ab.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(ab32 * ab32, axis=0, keepdims=True) + 1e-12)
    m = jnp.mean(gx, axis=-1, keepdims=True) + 1e-6
    nx = gx / m

    dyc = dy_ref[0]
    dz = jnp.dot(dyc, w2_ref[:].T, preferred_element_type=jnp.float32)
    z = gamma * (ab32 * nx) + be + ab32
    dw2_ref[...] += jnp.dot(
        z.astype(h_ref.dtype).T, dyc, preferred_element_type=jnp.float32
    )
    s1 = jnp.sum(dz * ab32, axis=0, keepdims=True)  # (1, C4)
    dg_ref[0] += (s1 * nx)[0]
    dbe_ref[0] += jnp.sum(dz, axis=0)
    dnx = gamma * s1
    dgx = dnx / m - jnp.sum(dnx * gx, axis=-1, keepdims=True) / (
        m * m * gx.shape[-1]
    )
    dab = dz * (gamma * nx + 1.0) + ab32 * (dgx / gx)
    ggrad = 0.5 * (1.0 + t) + 0.5 * h1 * (1.0 - t * t) * _K0 * (
        1.0 + 3.0 * _K1 * h1 * h1
    )
    dh1 = dab * ggrad
    db1_ref[0] += jnp.sum(dh1, axis=0)
    dh1b = dh1.astype(h_ref.dtype)
    dw1_ref[...] += jnp.dot(y.T, dh1b, preferred_element_type=jnp.float32)
    dyln = jnp.dot(dh1b, w1_ref[:].T, preferred_element_type=jnp.float32)
    dlns_ref[0] += jnp.sum(dyln * xhat, axis=0)
    dlnb_ref[0] += jnp.sum(dyln, axis=0)
    dyh = dyln * lns
    dacc = rstd * (
        dyh
        - jnp.mean(dyh, axis=-1, keepdims=True)
        - xhat * jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    )
    dacc_ref[0] = dacc.astype(dacc_ref.dtype)


def _tail_bwd_eligible(r: int, c: int, c4: int) -> bool:
    """~5 live (R, 4C) f32 buffers + the two f32 dW accumulators must fit
    scoped VMEM; the 96x96 stage-1 shape (75+ MB of live expanded tensors)
    falls back to the XLA recompute path."""
    live = 5 * r * c4 * 4 + 4 * r * c * 4
    accums = 2 * 2 * c * c4 * 4
    return live + accums < 85 * 1024 * 1024


def fused_train_wins(r: int, c: int, c4: int) -> bool:
    """Shapes where the fused-block TRAIN path (kernel fwd + Pallas tail
    backward) beats XLA's saved-intermediate backward, measured on v5e
    (B=16 per-block fwd+bwd): 48x48x256 fused 1.52 vs 2.21 ms XLA (-31%);
    24x24x512 1.51 vs 1.37 (+10%); 12x12x1024 1.60 vs 0.86 (2x — the small
    row count cannot amortize the f32 dW accumulator traffic). The fused
    backward only pays off when the expanded tensor is tall: many rows per
    image amortize the weight-gradient accumulators and the h1 recompute.
    Inference always uses the fused forward (no accumulators, no recompute)."""
    return _tail_bwd_eligible(r, c, c4) and r >= 2048


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_bwd_pallas(h, dy, ln_scale, ln_bias, w1, b1, w2, gamma, beta,
                     interpret: bool = False):
    """Backward of _tail_reference w.r.t. (h, lns, lnb, w1, b1, w2, gamma,
    beta) given cotangent dy. h/dy: (B, R, C). db2 (= sum of dy) is left to
    the caller. Returns f32 param grads."""
    b, r, c = h.shape
    c4 = w1.shape[1]

    def img_spec():
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _bwd_tail_kernel,
        grid=(b,),
        in_specs=[
            img_spec(), img_spec(),
            const_spec((1, c)), const_spec((1, c)),
            const_spec((c, c4)), const_spec((1, c4)),
            const_spec((c4, c)),
            const_spec((1, c4)), const_spec((1, c4)),
        ],
        out_specs=[
            img_spec(),
            const_spec((c, c4)), const_spec((c4, c)),
            const_spec((1, c4)), const_spec((1, c4)), const_spec((1, c4)),
            const_spec((1, c)), const_spec((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, c), h.dtype),
            jax.ShapeDtypeStruct((c, c4), jnp.float32),
            jax.ShapeDtypeStruct((c4, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * r * c * c4,
            bytes_accessed=4 * b * r * c * h.dtype.itemsize,
            transcendentals=2 * b * r * c4,
        ),
        interpret=interpret,
    )(
        h, dy,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        w1, b1.reshape(1, c4).astype(jnp.float32),
        w2,
        gamma.reshape(1, c4).astype(jnp.float32),
        beta.reshape(1, c4).astype(jnp.float32),
    )
    dacc, dw1, dw2, db1, dg, dbe, dlns, dlnb = outs
    return (dacc, dlns.reshape(c), dlnb.reshape(c), dw1, db1.reshape(c4),
            dw2, dg.reshape(c4), dbe.reshape(c4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def convnext_block_fused(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma, beta,
    interpret: bool = False,
):
    """ConvNeXtV2 block: dwconv on XLA + the fused LN/MLP/GRN Pallas tail.
    Differentiable since round 3: the backward recomputes the tail in a
    per-image Pallas kernel (stage shapes whose expanded tensors exceed
    VMEM, and non-TPU backends, recompute via the XLA _tail_reference)."""
    return _block_fused_fwd(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        beta, interpret,
    )


def _dwconv(x, dw_kernel, dw_bias):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, dw_kernel.reshape(7, 7, 1, c).astype(x.dtype),
        window_strides=(1, 1), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + dw_bias.astype(x.dtype)


def _block_vjp_fwd(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                   gamma, beta, interpret):
    out = _block_fused_fwd(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        beta, interpret,
    )
    return out, (x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                 gamma, beta)


def _block_vjp_bwd(interpret, res, dy):
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma, beta = res
    b, hh, ww, c = x.shape
    r, c4 = hh * ww, w1.shape[1]
    h, conv_vjp = jax.vjp(
        lambda x, k, bi: _dwconv(x, k, bi), x, dw_kernel, dw_bias
    )
    h = h.reshape(b, r, c)
    dyf = dy.reshape(b, r, c)
    db2 = jnp.sum(dyf.astype(jnp.float32), axis=(0, 1))
    from .vit_attn_pallas import pallas_bwd_enabled

    use_kernel = (not interpret and pallas_bwd_enabled()
                  and jax.default_backend() == "tpu"
                  and x.dtype == jnp.bfloat16 and _tail_bwd_eligible(r, c, c4))
    if use_kernel or interpret:
        (dacc, dlns, dlnb, dw1, db1, dw2, dg, dbe) = _tail_bwd_pallas(
            h, dyf.astype(h.dtype), ln_scale, ln_bias, w1, b1, w2, gamma,
            beta, interpret=interpret,
        )
    else:
        _, tail_vjp = jax.vjp(
            lambda h, lns, lnb, w1, b1, w2, g, be: _tail_reference(
                h, lns, lnb, w1, b1, w2, g, be
            ),
            h, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            w1, b1.astype(jnp.float32), w2, gamma.astype(jnp.float32),
            beta.astype(jnp.float32),
        )
        dacc, dlns, dlnb, dw1, db1, dw2, dg, dbe = tail_vjp(
            dyf.astype(jnp.float32)
        )
    dx_conv, ddwk, ddwb = conv_vjp(dacc.reshape(b, hh, ww, c).astype(h.dtype))
    return (
        (dy + dx_conv).astype(x.dtype),
        ddwk.astype(dw_kernel.dtype), ddwb.astype(dw_bias.dtype),
        dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
        dg.astype(gamma.dtype), dbe.astype(beta.dtype),
    )


convnext_block_fused.defvjp(_block_vjp_fwd, _block_vjp_bwd)


def fused_mlp_enabled(dtype) -> bool:
    """bf16 on TPU only (f32 keeps the exact-GELU XLA path); XMIR_FUSED_MLP
    overrides (0/1)."""
    flag = os.environ.get("XMIR_FUSED_MLP", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
