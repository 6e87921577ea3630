"""Profile the insertion/deletion hot loop on the chip (VERDICT r4 #3).

Sweeps (pairs, batch_steps) for causal_scores_batch and isolates the
reveal-image reconstruction cost from the embed cost, against the raw
DenseNet121 embed rate at matching batch sizes. Prints one JSON line.

Usage: python tools/profile_insdel.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from bench import _densenet_bf16, _loop_time


def embed_rate(batch):
    model, variables, x = _densenet_bf16(batch)

    def make_loop(iters):
        def run(v, x):
            def body(_, carry):
                acc, bump = carry
                e = model.apply(v, x + bump, train=False)["embedding"]
                s = jnp.sum(e).astype(jnp.float32)
                return acc + s, (s * 0e-30).astype(x.dtype)
            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc
        return run

    dt = _loop_time(make_loop, variables, x, n1=2, n2=6)
    return batch / dt


def insdel_rate(pairs, batch_steps, step=1000, both=True):
    from xmir_tpu.xai.causal import (
        blur_substrate, causal_scores_batch, saliency_rank, zeros_substrate,
    )

    model, variables, x = _densenet_bf16(pairs)
    rng = np.random.default_rng(1)
    sal = jnp.asarray(rng.random((pairs, 224 * 224)), jnp.float32)
    ranks = jax.vmap(saliency_rank)(sal)
    blur = blur_substrate()

    def embed_fn(v, imgs):
        return model.apply(v, imgs, train=False)["embedding"]

    def make_loop(iters):
        def run(v, xx):
            q_feat = embed_fn(v, xx[:1])[0]
            zsub = zeros_substrate(xx).astype(xx.dtype)
            bsub = blur(xx).astype(xx.dtype)

            def body(_, carry):
                acc, bump = carry
                xi = xx + bump
                s_del = causal_scores_batch(
                    embed_fn, v, q_feat, xi, zsub, ranks, step,
                    batch_steps=batch_steps,
                )
                s = jnp.sum(s_del)
                if both:
                    s_ins = causal_scores_batch(
                        embed_fn, v, q_feat, bsub + bump, xi, ranks, step,
                        batch_steps=batch_steps,
                    )
                    s = s + jnp.sum(s_ins)
                return acc + s.astype(jnp.float32), (s * 0e-30).astype(xx.dtype)

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc
        return run

    dt = _loop_time(make_loop, variables, x, n1=1, n2=3)
    return pairs / dt


def reconstruct_only(pairs, batch_steps, step=1000):
    """The reveal-image reconstruction (mask + where) WITHOUT the embed:
    bounds how much of the step cost is the reconstruction itself."""
    from xmir_tpu.xai.causal import saliency_rank

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((pairs, 224, 224, 3)), jnp.bfloat16)
    sal = jnp.asarray(rng.random((pairs, 224 * 224)), jnp.float32)
    ranks = jax.vmap(saliency_rank)(sal)
    hw = 224 * 224
    n_steps = -(-hw // step)
    n_chunks = -(-(n_steps + 1) // batch_steps)

    def make_loop(iters):
        def run(xx, rk):
            rank_img = rk.reshape(pairs, 224, 224)
            zsub = jnp.zeros_like(xx)

            def body(_, carry):
                acc, bump = carry
                step_ids = jnp.arange(n_chunks * batch_steps).reshape(
                    n_chunks, batch_steps
                )

                def one_chunk(ids):
                    mask = rank_img[None] < (ids[:, None, None, None] * step)
                    imgs = jnp.where(mask[..., None], zsub[None], (xx + bump)[None])
                    return jnp.sum(imgs.astype(jnp.float32), axis=(1, 2, 3, 4))

                s = jnp.sum(jax.lax.map(one_chunk, step_ids))
                return acc + s, (s * 0e-30).astype(xx.dtype)

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc
        return run

    dt = _loop_time(make_loop, x, ranks, n1=1, n2=3)
    return pairs / dt


def main():
    out = {"embed_img_per_sec": {}}
    for b in (64, 128, 256):
        out["embed_img_per_sec"][b] = round(embed_rate(b), 1)
    out["insdel_pairs_per_sec"] = {}
    for pairs, bs in [(8, 8), (8, 16), (8, 32), (16, 8), (16, 16), (32, 8)]:
        try:
            out["insdel_pairs_per_sec"][f"p{pairs}_bs{bs}"] = round(
                insdel_rate(pairs, bs), 2
            )
        except Exception as e:
            out["insdel_pairs_per_sec"][f"p{pairs}_bs{bs}"] = f"ERR {e}"[:80]
    out["reconstruct_only_pairs_per_sec"] = {}
    for pairs, bs in [(8, 8), (8, 16)]:
        out["reconstruct_only_pairs_per_sec"][f"p{pairs}_bs{bs}"] = round(
            reconstruct_only(pairs, bs), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
