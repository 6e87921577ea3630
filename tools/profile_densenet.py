"""Profile DenseNet121 dense-block formulations on the current backend.

DenseNet121 measures ~20% MFU (BENCHMARKS.md) and the working hypothesis is
concat traffic: every _DenseLayer writes a fresh (B,H,W,C_i+32) concat, so a
block rewrites O(L^2 * k) channels of feature map to HBM. This tool times one
dense block three ways on identical math (eval-mode BN folded to scale/shift):

  concat   — the current model formulation: concat after every layer
  buffer   — preallocated (B,H,W,C_final) buffer + lax.dynamic_update_slice
             writes, lax.slice reads (tests whether XLA updates in place)
  segsum   — concat-free: segments kept as a list; each layer's 1x1 conv is
             computed as sum_seg relu(bn_seg(seg)) @ W_seg so the concat is
             never materialized (only the 32-channel layer outputs hit HBM)

Reference hot path this feeds: CheXNet DenseNet121 embedding extraction
(reference model.py:42-84, test.py evaluate).

Usage:
  python tools/profile_densenet.py --block 2 --batch 64
  python tools/profile_densenet.py --all
"""
import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# (H=W, C_in, num_layers) for DenseNet121 blocks 1-4 at 224px input
BLOCKS = {1: (56, 64, 6), 2: (28, 128, 12), 3: (14, 256, 24), 4: (7, 512, 16)}
GROWTH, BOTTLENECK = 32, 128
N1, N2 = 2, 8


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def loop_time(fn, *args):
    def run(iters, *a):
        def body(_, carry):
            acc, bump = carry
            out = fn(*jax.tree_util.tree_map(lambda t: t + bump.astype(t.dtype), a))
            s = jnp.sum(out).astype(jnp.float32)
            return acc + s, s * 0e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.float32(0)))
        return acc

    f = jax.jit(run)
    float(f(N1, *args))
    float(f(N2, *args))
    t1 = min(_timed(lambda: float(f(N1, *args))) for _ in range(3))
    t2 = min(_timed(lambda: float(f(N2, *args))) for _ in range(3))
    return max((t2 - t1) / (N2 - N1), 1e-9)


def make_params(rng, c_in, n_layers, dtype):
    """Per-layer eval-mode params: bn folded to (scale, shift) over C_i."""
    ps = []
    for i in range(n_layers):
        c_i = c_in + i * GROWTH
        ps.append(dict(
            s1=jnp.asarray(rng.standard_normal(c_i) * 0.1 + 1, dtype),
            b1=jnp.asarray(rng.standard_normal(c_i) * 0.1, dtype),
            w1=jnp.asarray(rng.standard_normal((c_i, BOTTLENECK)) / np.sqrt(c_i), dtype),
            s2=jnp.asarray(rng.standard_normal(BOTTLENECK) * 0.1 + 1, dtype),
            b2=jnp.asarray(rng.standard_normal(BOTTLENECK) * 0.1, dtype),
            w2=jnp.asarray(
                rng.standard_normal((3, 3, BOTTLENECK, GROWTH)) / 34.0, dtype),
        ))
    return ps


def bottleneck_tail(h, p):
    """bn2 -> relu -> 3x3 conv (the part common to all formulations)."""
    h = jax.nn.relu(h * p["s2"] + p["b2"])
    return jax.lax.conv_general_dilated(
        h, p["w2"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_concat(x, params):
    for p in params:
        h = jax.nn.relu(x * p["s1"] + p["b1"])
        b, hh, ww, c = h.shape
        h = (h.reshape(-1, c) @ p["w1"]).reshape(b, hh, ww, BOTTLENECK)
        x = jnp.concatenate([x, bottleneck_tail(h, p)], axis=-1)
    return x


def block_buffer(x, params):
    b, hh, ww, c0 = x.shape
    c_fin = c0 + len(params) * GROWTH
    buf = jnp.zeros((b, hh, ww, c_fin), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
    for i, p in enumerate(params):
        c_i = c0 + i * GROWTH
        xi = jax.lax.slice(buf, (0, 0, 0, 0), (b, hh, ww, c_i))
        h = jax.nn.relu(xi * p["s1"] + p["b1"])
        h = (h.reshape(-1, c_i) @ p["w1"]).reshape(b, hh, ww, BOTTLENECK)
        buf = jax.lax.dynamic_update_slice(
            buf, bottleneck_tail(h, p), (0, 0, 0, 0, )[:3] + (c_i,))
    return buf


def block_segsum(x, params):
    b, hh, ww, _ = x.shape
    segs = [x]
    offs = [0]
    for p in params:
        acc = 0.0
        for seg, off in zip(segs, offs):
            c_s = seg.shape[-1]
            s = jax.lax.dynamic_slice_in_dim(p["s1"], off, c_s)
            bb = jax.lax.dynamic_slice_in_dim(p["b1"], off, c_s)
            w = jax.lax.dynamic_slice_in_dim(p["w1"], off, c_s, axis=0)
            hseg = jax.nn.relu(seg * s + bb)
            acc = acc + hseg.reshape(-1, c_s) @ w
        h = acc.reshape(b, hh, ww, BOTTLENECK)
        new = bottleneck_tail(h, params[len(segs) - 1])
        offs.append(offs[-1] + segs[-1].shape[-1])
        segs.append(new)
    return sum(jnp.sum(s) for s in segs) + jnp.zeros((1,), x.dtype)


def run_block(idx, batch, dtype):
    hw, c0, nl = BLOCKS[idx]
    rng = np.random.default_rng(idx)
    x = jnp.asarray(rng.standard_normal((batch, hw, hw, c0)), dtype)
    params = make_params(rng, c0, nl, dtype)

    res = {}
    res["concat_ms"] = loop_time(lambda y: jnp.sum(block_concat(y, params)), x) * 1e3
    res["buffer_ms"] = loop_time(lambda y: jnp.sum(block_buffer(y, params)), x) * 1e3
    res["segsum_ms"] = loop_time(lambda y: block_segsum(y, params), x) * 1e3

    # components: all conv1 1x1 matmuls alone (at each layer's true width, on a
    # fixed input so no concat chain), and all conv2 3x3 convs alone
    def conv1_only(y):
        acc = jnp.float32(0)
        for i, p in enumerate(params):
            c_i = c0 + i * GROWTH
            h = jax.nn.relu(y[..., :c_i] * p["s1"] + p["b1"])
            acc += jnp.sum(h.reshape(-1, c_i) @ p["w1"]).astype(jnp.float32)
        return acc

    def conv2_only(h):
        acc = jnp.float32(0)
        for p in params:
            acc += jnp.sum(bottleneck_tail(h, p)).astype(jnp.float32)
        return acc

    c_max = c0 + (nl - 1) * GROWTH
    xi_max = jnp.asarray(rng.standard_normal((batch, hw, hw, c_max)), dtype)
    res["conv1_all_ms"] = loop_time(conv1_only, xi_max) * 1e3
    hbot = jnp.asarray(rng.standard_normal((batch, hw, hw, BOTTLENECK)), dtype)
    res["conv2_all_ms"] = loop_time(conv2_only, hbot) * 1e3

    # matmul FLOPs in the block (conv1 1x1 + conv2 3x3)
    flops = 0
    for i in range(nl):
        c_i = c0 + i * GROWTH
        flops += batch * hw * hw * (c_i * BOTTLENECK + 9 * BOTTLENECK * GROWTH) * 2
    # minimal HBM traffic: read input once, write each 32ch output once,
    # re-read accumulated features once per layer (conv1 input)
    bytes_min = 0
    esz = jnp.dtype(dtype).itemsize
    for i in range(nl):
        c_i = c0 + i * GROWTH
        bytes_min += batch * hw * hw * (c_i + 2 * BOTTLENECK + GROWTH) * esz
    print(f"block {idx}: {hw}x{hw} C0={c0} L={nl} B={batch} {np.dtype(dtype).name}")
    for k, v in res.items():
        tf = flops / (v / 1e3) / 1e12
        gb = bytes_min / (v / 1e3) / 1e9
        print(f"  {k:12s} {v:8.3f} ms   {tf:6.1f} TF/s   {gb:7.1f} GB/s(min-traffic)")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    blocks = list(BLOCKS) if args.all else [args.block]
    for i in blocks:
        run_block(i, args.batch, dtype)


if __name__ == "__main__":
    main()
