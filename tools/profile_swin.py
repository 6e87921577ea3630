"""Component-level profile of one SwinV2 block on the current backend.

Times each piece of a SwinV2Block (default: stage 2, the 18-block stage that
dominates swinv2_base_window12to24_192to384 at 384px) with the same
fori_loop differencing methodology as bench_towers.py, so the component sum
can be compared against the whole-model time to locate the MFU gap
(BENCHMARKS.md round-3 note: SwinV2 measured ~27% MFU vs DINOv2's 46%).

Usage:
  python tools/profile_swin.py --stage 2 --batch 16
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# (grid, C, num_heads, win) per stage of swinv2_base_window12to24_192to384 @384
STAGES = {
    0: (96, 128, 4, 24),
    1: (48, 256, 8, 24),
    2: (24, 512, 16, 24),
    3: (12, 1024, 32, 12),
}
N1, N2 = 4, 16


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def loop_time(fn, *args):
    """Median-of-3 differenced fori_loop time for fn(*args) -> scalar-summable."""

    def run(iters, *a):
        def body(_, carry):
            acc, bump = carry
            out = fn(*jax.tree_util.tree_map(lambda t: t + bump.astype(t.dtype), a))
            s = jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            return acc + s, s * 0e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.float32(0)))
        return acc

    f = jax.jit(run, static_argnums=())
    float(f(N1, *args))
    float(f(N2, *args))
    t1 = min(_timed(lambda: float(f(N1, *args))) for _ in range(3))
    t2 = min(_timed(lambda: float(f(N2, *args))) for _ in range(3))
    return max((t2 - t1) / (N2 - N1), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--shift", action="store_true", help="profile the shifted block")
    args = p.parse_args()

    from xmir_tpu.models.swin import (
        SwinV2Block,
        _axis_onehot,
        window_partition,
        window_reverse,
    )
    from xmir_tpu.ops.vit_attn_pallas import biased_attention_fused

    grid, C, nh, win = STAGES[args.stage]
    B, hd, n = args.batch, C // nh, win * win
    nw = (grid // win) ** 2
    shift = win // 2 if args.shift else 0
    dt_c = jnp.bfloat16
    rng = np.random.default_rng(0)

    def randn(*shape, dtype=dt_c):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    x = randn(B, grid, grid, C)
    block = SwinV2Block(C, nh, win, shift=shift, pretrained_window=12)
    variables = jax.jit(block.init)(jax.random.PRNGKey(0), x)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dt_c) if a.dtype == jnp.float32 else a, variables
    )

    results = {}
    t_block = loop_time(lambda y: block.apply(variables, y), x)
    results["full_block_ms"] = t_block * 1e3

    # --- components, stand-alone params (shapes match, values arbitrary) ---
    xw = randn(B * nw, n, C)
    qkv_w = randn(C, 3 * C)
    results["qkv_matmul_ms"] = loop_time(lambda y: y @ qkv_w, xw) * 1e3

    q = randn(nh * nw * B, n, hd)
    results["cosine_norm_ms"] = (
        loop_time(
            lambda t: t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12),
            q,
        )
        * 2e3
    )  # x2: q and k

    # bias MLP + Toeplitz expansion (f32, shared across the batch)
    table = randn(2 * win - 1, 2 * win - 1, 2, dtype=jnp.float32)
    w1, b1 = randn(2, 512, dtype=jnp.float32), randn(512, dtype=jnp.float32)
    w2 = randn(512, nh, dtype=jnp.float32)
    oh = jnp.asarray(_axis_onehot(win))

    def bias_fn(tbl):
        h1 = jax.nn.relu(tbl @ w1 + b1)
        t2 = 16.0 * jax.nn.sigmoid(h1 @ w2)
        g1 = jnp.einsum("ykd,dch->ykch", oh, t2)
        return jnp.einsum("ykch,xlc->hyxkl", g1, oh).reshape(nh, n, n)

    results["bias_mlp_expand_ms"] = loop_time(bias_fn, table) * 1e3

    # fused attention kernel alone
    k, v = randn(nh * nw * B, n, hd), randn(nh * nw * B, n, hd)
    bias = randn(nh, n, n, dtype=jnp.float32)
    scale_g = jnp.full((nh,), 10.0, jnp.float32)
    g_size = nw * B
    results["attn_kernel_ms"] = (
        loop_time(
            lambda qq, kk, vv: biased_attention_fused(
                qq, kk, vv, bias, scale_g, g_size, True
            ),
            q,
            k,
            v,
        )
        * 1e3
    )

    # head fold/unfold transposes around the kernel
    def fold(t):
        t = t.reshape(B, nw, nh, n, hd)
        return jnp.transpose(t, (2, 1, 0, 3, 4)).reshape(-1, n, hd)

    qkv_full = randn(B * nw, n, 3, nh, hd)
    results["head_fold_ms"] = (
        loop_time(
            lambda t: sum(
                jnp.sum(fold(jnp.swapaxes(m, 1, 2)))
                for m in jnp.moveaxis(t, 2, 0)
            ),
            qkv_full,
        )
        * 1e3
    )

    proj_w = randn(C, C)
    out_folded = randn(nh, nw, B, n, hd)
    results["unfold_proj_ms"] = (
        loop_time(
            lambda t: jnp.transpose(t, (2, 1, 3, 0, 4)).reshape(B * nw, n, C) @ proj_w,
            out_folded,
        )
        * 1e3
    )

    # window partition + reverse
    results["win_partition_reverse_ms"] = (
        loop_time(lambda y: window_reverse(window_partition(y, win), win, grid, grid), x)
        * 1e3
    )

    # LN + residual (x2 per block)
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    lnv = jax.jit(ln.init)(jax.random.PRNGKey(0), x)
    results["ln_residual_ms"] = (
        loop_time(lambda y: y + ln.apply(lnv, y).astype(dt_c), x) * 2e3
    )

    # MLP fc1 -> gelu -> fc2
    w_fc1, w_fc2 = randn(C, 4 * C), randn(4 * C, C)
    results["mlp_ms"] = (
        loop_time(lambda y: jax.nn.gelu(y @ w_fc1, approximate=True) @ w_fc2, x) * 1e3
    )

    comp_sum = sum(v for k_, v in results.items() if k_ != "full_block_ms")
    print(f"stage {args.stage} shift={bool(shift)} B={B} grid={grid} C={C} "
          f"nh={nh} win={win} nw={nw}")
    for k_, v in results.items():
        print(f"  {k_:28s} {v:8.3f}")
    print(f"  {'component_sum_ms':28s} {comp_sum:8.3f}")

    # MXU-useful FLOPs in the block (fwd) for MFU accounting
    flops = (
        B * nw * n * C * 3 * C * 2          # qkv
        + B * nw * nh * 2 * 2 * n * n * hd  # scores + av
        + B * nw * n * C * C * 2            # proj
        + B * grid * grid * C * 8 * C * 2   # mlp
    )
    print(f"  block matmul GFLOP: {flops/1e9:.2f}  "
          f"-> full-block TF/s: {flops/t_block/1e12:.1f}")


if __name__ == "__main__":
    main()
