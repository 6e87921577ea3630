"""Full ConceptCLIP dual-encoder train-step throughput, deduped vs not.

The step is the reference train.py:221-397 loop: IT-Align + RC-Align on
SigLIP-SO400M vision + PubMedBERT text, with per-sample concept strings
encoded through the text tower. VinDr concepts come from a fixed 22-name
vocabulary (read_data.py), so the deduped step encodes the <=22 unique
names once per step and gathers, instead of all B*W slots.

Methodology matches tools/bench_towers.py: on-device fori_loop with a
sequential dependency, two trip counts differenced.

Usage: python tools/bench_conceptclip.py [--batch 4] [--concepts 8]
"""
import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N1, N2 = 2, 8


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench(dedupe: bool, batch: int, w_c: int, lc: int, seq_len: int) -> float:
    import optax

    from xmir_tpu.models import create_model
    from xmir_tpu.train import (
        create_train_state,
        dedupe_concept_batch,
        make_conceptclip_train_step,
    )

    model, spec = create_model("conceptclip")
    rng = np.random.default_rng(0)
    s = spec.input_size
    pix = jnp.asarray(rng.standard_normal((batch, s, s, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 30000, (batch, seq_len)), jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.int32)
    # concepts drawn WITHOUT replacement per sample from a 22-name vocabulary
    # of lc-token rows (the VinDr contract, data/datasets.py:46-53)
    vocab = rng.integers(1, 30000, (22, lc)).astype(np.int32)
    picks = np.stack([rng.permutation(22)[:w_c] for _ in range(batch)])
    cids = vocab[picks]  # (B, W, lc)
    cmask = np.ones((batch, w_c), bool)
    ctok = cids != 0

    tx = optax.adam(1e-5)
    variables = jax.jit(
        lambda r: model.init(r, pix[:1], ids[:1], mask[:1],
                             method=model.forward_clip)
    )(jax.random.PRNGKey(0))
    state = create_train_state(model, jax.random.PRNGKey(0), None, tx,
                               variables=variables)
    del variables  # free the init copy: the SO400M step fits HBM by ~40MB
    pix = pix.astype(jnp.bfloat16)  # step casts to compute_dtype anyway
    step = make_conceptclip_train_step(
        model, alpha=0.5, compute_dtype=jnp.bfloat16, dedupe_concepts=dedupe
    )
    if dedupe:
        u_ids, u_mask, inverse = dedupe_concept_batch(cids, ctok)
        print(f"  unique concept rows: {np.unique(cids.reshape(-1, lc), axis=0).shape[0]}"
              f" -> padded {u_ids.shape[0]} (vs {batch * w_c} undeduped)")
        cargs = (jnp.asarray(u_ids), jnp.asarray(cmask), jnp.asarray(u_mask),
                 jnp.asarray(inverse))
    else:
        cargs = (jnp.asarray(cids), jnp.asarray(cmask), jnp.asarray(ctok))

    def run(iters, state, pix, ids, mask, *cargs):
        def body(_, carry):
            st, bump = carry
            st, metrics = step(st, pix + bump, ids, mask, *cargs)
            return st, metrics["loss"] * 0e-30

        st, _ = jax.lax.fori_loop(0, iters, body, (state, 0.0))
        return st.step.astype(jnp.float32) + jax.tree_util.tree_reduce(
            lambda a, p: a + jnp.sum(p).astype(jnp.float32) * 0e-30, st.params, 0.0
        )

    f = jax.jit(run)
    float(f(jnp.int32(N1), state, pix, ids, mask, *cargs))
    float(f(jnp.int32(N2), state, pix, ids, mask, *cargs))
    t1 = min(_timed(lambda: float(f(jnp.int32(N1), state, pix, ids, mask, *cargs)))
             for _ in range(2))
    t2 = min(_timed(lambda: float(f(jnp.int32(N2), state, pix, ids, mask, *cargs)))
             for _ in range(2))
    return batch / max((t2 - t1) / (N2 - N1), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--concepts", type=int, default=8)
    p.add_argument("--concept-len", type=int, default=16)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--modes", default="dedupe,reference")
    args = p.parse_args()
    for mode in args.modes.split(","):
        t0 = time.time()
        ips = bench(mode == "dedupe", args.batch, args.concepts,
                    args.concept_len, args.seq_len)
        print(f"{mode}: {ips:.1f} img/s (wall {time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
