"""Per-backbone throughput benchmarks on the current JAX backend.

Measures, per registry model at its native resolution:
  embed  — inference img/s (bf16 params+activations, the serving path)
  train  — fwd+bwd+Adam-update img/s (bf16 activations, f32 params — the
           reference's hot loop, train.py:47-148)

Methodology matches bench.py: the op runs inside an on-device lax.fori_loop
with a sequential scalar data dependency; two iteration counts are
differenced to cancel the tunnel's fixed dispatch/fetch overhead.

Usage:
  python tools/bench_towers.py --models densenet121,dinov2 --mode both
  python tools/bench_towers.py --models all --mode embed --json out.json
"""
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiled executables across processes: the axon tunnel's compiles
# run 20s-10min+, and the remat/large-batch train configs exceed one bench
# window without this. Opt out with XMIR_NO_COMPILE_CACHE=1.
if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# (embed batch, train batch) tuned to v5e HBM at each tower's resolution
BATCHES = {
    "resnet50": (64, 64),
    "densenet121": (128, 64),
    "convnextv2": (32, 16),
    "convnextv2_sra": (32, 16),
    "convnextv2_pcam": (32, 16),
    "swinv2": (16, 8),
    "dinov2": (16, 8),
    "medsiglip": (8, 4),
    "conceptclip": (8, 4),
    "nih_dinov2": (16, 8),
    "nih_convnextv2": (32, 16),
    "ath": (128, 128),
    "tiny": (256, 256),
}
N1, N2 = 2, 8


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _loop_time(make_loop_fn, *args):
    """One compile: the fori_loop trip count is a TRACED argument (lowers to
    a while loop), so the N1- and N2-iteration timings share a single
    compiled executable — halving the dominant cost on the slow-compile
    tunnel vs two specialized loop functions."""
    f = jax.jit(make_loop_fn(None))
    float(f(jnp.int32(N1), *args))
    float(f(jnp.int32(N2), *args))
    t1 = min(_timed(lambda: float(f(jnp.int32(N1), *args))) for _ in range(2))
    t2 = min(_timed(lambda: float(f(jnp.int32(N2), *args))) for _ in range(2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


def bench_embed(name: str, batch: int | None = None) -> float:
    from xmir_tpu.models import create_model

    model, spec = create_model(name)
    b = batch or BATCHES.get(name, (16, 8))[0]
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(
        rng.standard_normal((b, spec.input_size, spec.input_size, 3)), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )
    x = x32.astype(jnp.bfloat16)

    def make_loop(_):
        def run(iters, v, x):
            def body(_, carry):
                acc, bump = carry
                out = model.apply(v, x + bump, train=False)
                e = out["embedding"] if isinstance(out, dict) else out
                s = jnp.sum(e).astype(jnp.float32)
                return acc + s, (s * 0e-30).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc

        return run

    dt = _loop_time(make_loop, variables, x)
    return b / dt


def bench_train(
    name: str, batch: int | None = None, loss: str = "supcon", remat: bool = False
) -> float:
    """fwd+bwd+update img/s: the reference train_epoch hot loop."""
    import optax

    from xmir_tpu.models import create_model
    from xmir_tpu.train.state import create_train_state
    from xmir_tpu.train.steps import make_embedding_train_step

    try:
        model, spec = create_model(name, embedding_dim=128)
    except TypeError:
        # dual-encoder embedders (medsiglip/conceptclip) fix their own
        # projection width; fine-tune them at it
        model, spec = create_model(name)
    b = batch or BATCHES.get(name, (16, 8))[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, spec.input_size, spec.input_size, 3)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 3, b), jnp.int32)
    # reference optimizer: Adam + grad-clip 5.0 (train.py:98-101)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    state = create_train_state(model, jax.random.PRNGKey(0), x[:2], tx)
    step = make_embedding_train_step(
        model, loss, compute_dtype=jnp.bfloat16, remat=remat
    )

    def make_loop(_):
        def run(iters, state, x, labels):
            def body(_, carry):
                st, bump = carry
                st, metrics = step(st, x + bump, labels)
                return st, metrics["loss"] * 0e-30

            st, _ = jax.lax.fori_loop(0, iters, body, (state, 0.0))
            return st.step.astype(jnp.float32) + jax.tree_util.tree_reduce(
                lambda a, p: a + jnp.sum(p).astype(jnp.float32) * 0e-30,
                st.params,
                0.0,
            )

        return run

    dt = _loop_time(make_loop, state, x, labels)
    return b / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="densenet121",
                   help="comma list or 'all'")
    p.add_argument("--mode", default="embed", choices=["embed", "train", "both"])
    p.add_argument("--batch", type=int, default=0, help="override batch size")
    p.add_argument("--loss", default="supcon")
    p.add_argument("--remat", action="store_true",
                   help="rematerialized backward (gradient checkpointing)")
    p.add_argument("--json", default="", help="write results JSON here")
    args = p.parse_args()

    names = (
        sorted(BATCHES) if args.models == "all" else args.models.split(",")
    )
    results = {}
    for name in names:
        row = {}
        if args.mode in ("embed", "both"):
            t0 = time.time()
            row["embed_img_per_sec"] = round(
                bench_embed(name, args.batch or None), 1
            )
            row["embed_wall_s"] = round(time.time() - t0, 1)
        if args.mode in ("train", "both"):
            t0 = time.time()
            row["train_img_per_sec"] = round(
                bench_train(name, args.batch or None, args.loss, args.remat), 1
            )
            row["train_wall_s"] = round(time.time() - t0, 1)
        results[name] = row
        print(name, row, flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"platform": jax.devices()[0].platform, "results": results}, f,
                indent=2,
            )


if __name__ == "__main__":
    main()
