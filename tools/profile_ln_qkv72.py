"""Chip microbench: ln_qkv_fused at SO400M geometry (head_dim=72) vs the XLA
LN + head-major einsum it would replace (VERDICT r4 #5).

SO400M (MedSigLIP/ConceptCLIP vision tower): C=1152, H=16, hd=72, N=1024
(@448/14 patches) or 729 (@378/14). hd=72 breaks the kernel's 128-lane
head-major emission; this measures what Mosaic's relayout actually costs.

Usage: python tools/profile_ln_qkv72.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def loop_time(fn_body, args, n1=10, n2=50, reps=3):
    def make(iters):
        def run(*a):
            def body(_, carry):
                acc, bump = carry
                out = fn_body(*((a[0] + bump,) + a[1:]))
                s = sum(jnp.sum(o).astype(jnp.float32) for o in out)
                return acc + s, (s * 0e-30).astype(a[0].dtype)
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (0.0, jnp.zeros((), a[0].dtype))
            )
            return acc
        return run

    f1, f2 = jax.jit(make(n1)), jax.jit(make(n2))
    float(f1(*args)); float(f2(*args))
    t1 = min(_timed(lambda: float(f1(*args))) for _ in range(reps))
    t2 = min(_timed(lambda: float(f2(*args))) for _ in range(reps))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    from xmir_tpu.ops.ln_dense_pallas import _ln_qkv_reference, ln_qkv_fused

    out = {}
    for name, (b, n, c, h) in {
        "so400m_448": (4, 1024, 1152, 16),   # hd=72
        "dinov2_518": (4, 1370, 768, 12),    # hd=64 control
    }.items():
        rng = np.random.default_rng(0)
        hd = c // h
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
        lns = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        lnb = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1, jnp.float32)

        def xla_body(x, lns, lnb, w, bias):
            return _ln_qkv_reference(x, lns, lnb, w, bias, h, 1e-6)

        def fused_body(x, lns, lnb, w, bias):
            return ln_qkv_fused(x, lns, lnb, w, bias, h, 1e-6, 0, False)

        args = (x, lns, lnb, w, bias)
        row = {"shape": f"B{b} N{n} C{c} H{h} hd{hd}"}
        row["xla_ms"] = round(loop_time(xla_body, args) * 1e3, 3)
        try:
            # correctness on chip first
            qf, kf, vf = jax.jit(fused_body)(*args)
            qr, kr, vr = jax.jit(xla_body)(*args)
            md = max(
                float(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max())
                for a, r in ((qf, qr), (kf, kr), (vf, vr))
            )
            row["maxdiff_vs_xla"] = md
            row["fused_ms"] = round(loop_time(fused_body, args) * 1e3, 3)
            row["speedup"] = round(row["xla_ms"] / row["fused_ms"], 3)
        except Exception as e:
            row["fused_error"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
