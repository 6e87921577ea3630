"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: exact top-10 query throughput over a 100k-image gallery
(the Milvus-replacement north star; BASELINE.md targets >=50,000 QPS on a
v5e-8, i.e. 6,250 QPS/chip). Extras record embedding throughput
(>=10,000 img/s on v5e-8 => 1,250 img/s/chip target).

Timing methodology: the remote-execution tunnel makes host-side
block_until_ready unreliable and adds ~10ms RPC latency per fetch, so each
benchmark runs its op inside an on-device lax.fori_loop with a sequential
data dependency (iteration i+1 consumes a scalar from iteration i), and the
wall time of (N2 iters) - (N1 iters) single fetches cancels the fixed
tunnel/dispatch overhead.

vs_baseline = measured QPS / per-chip share of the v5e-8 target.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: first run pays the tunnel's slow compiles,
# subsequent runs (same shapes) start hot. Opt out: XMIR_NO_COMPILE_CACHE=1.
if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

GALLERY_N = 100_000
DIM = 1024
K = 10
QUERY_BATCH = 1024
EMBED_BATCH = 128
TARGET_QPS_V5E8 = 50_000.0
TARGET_IPS_V5E8 = 10_000.0
N1, N2 = 2, 10


def _loop_time(make_loop_fn, *args, n1: int = N1, n2: int = N2, reps: int = 3):
    """Return seconds per single iteration of the op, overhead-cancelled.

    min-of-`reps` per iteration count: the tunnel occasionally stalls a
    single fetch by tens of ms, which at small n2 can inflate the result
    several-fold (a 94k-QPS outlier on a 490k bench was one such stall);
    the min is the right estimator for a noise floor that is always
    additive. Fast ops should also pass larger n1/n2 so the differenced
    work dwarfs any residual jitter."""
    f1 = jax.jit(make_loop_fn(n1))
    f2 = jax.jit(make_loop_fn(n2))
    float(f1(*args))  # compile + warm
    float(f2(*args))
    t1 = min(_timed(lambda: float(f1(*args))) for _ in range(reps))
    t2 = min(_timed(lambda: float(f2(*args))) for _ in range(reps))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_search(on_tpu: bool):
    from xmir_tpu.ops.topk import tiled_topk
    from xmir_tpu.ops.topk_pallas import fused_topk

    rng = np.random.default_rng(0)
    gallery = jnp.asarray(rng.standard_normal((GALLERY_N, DIM)).astype(np.float32))
    gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)
    queries = gallery[:QUERY_BATCH]

    if on_tpu:
        search = lambda q, g: fused_topk(q, g, K, metric="ip", tile_q=512, tile_g=2048)
        kernel = "pallas_fused"
        try:  # probe one Mosaic compile; fall back to XLA if the tunnel's
            # remote kernel-compile helper is unavailable so the driver
            # still records a (slower) number instead of nothing
            jax.block_until_ready(search(queries[:8], gallery[:4096]))
        except Exception:
            search = lambda q, g: tiled_topk(q, g, K, tile=8192, metric="ip")
            kernel = "xla_tiled_fallback"
    else:
        search = lambda q, g: tiled_topk(q, g, K, tile=8192, metric="ip")
        kernel = "xla_tiled"

    def make_loop(iters):
        def run(q, g):
            def body(_, carry):
                acc, bump = carry
                vals, idxs = search(q + bump, g)
                s = jnp.sum(vals) + jnp.sum(idxs).astype(jnp.float32)
                return acc + s, s * 0e-30  # sequential dependency, value ~0
            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, 0.0))
            return acc
        return run

    dt = _loop_time(make_loop, queries, gallery, n1=10, n2=50)
    return QUERY_BATCH / dt, kernel


def bench_search_sharded():
    """Headline search through the DEPLOYMENT shape — the PRODUCT code path:
    index/gallery.py::make_sharded_search_step (per-shard fused Pallas top-K
    under shard_map + merge_shard_candidates), the very function
    ShardedGalleryIndex._search_sharded jits and serves — wrapped in the
    on-device timing loop against the index's build()-aligned gallery
    placement (128-aligned shards -> the kernel's zero-copy fast path).
    Benchmarked code == served code by construction (VERDICT r4 #4; the old
    bench re-implemented the search inline and could drift)."""
    from xmir_tpu.index import ShardedGalleryIndex
    from xmir_tpu.index.gallery import _pick_tile_g, make_sharded_search_step
    from xmir_tpu.parallel import make_mesh
    from xmir_tpu.parallel.mesh import DATA_AXIS

    rng = np.random.default_rng(0)
    gallery = rng.standard_normal((GALLERY_N, DIM)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)

    mesh = make_mesh((jax.device_count(),), axis_names=("data",))
    idx = ShardedGalleryIndex(dim=DIM, metric="ip")
    idx.add(gallery)
    idx.build(mesh)
    n_dev = mesh.shape[DATA_AXIS]
    shard_rows = idx._device_embeds.shape[0] // n_dev
    step = make_sharded_search_step(
        mesh, K, shard_rows, GALLERY_N, "pallas", "ip", jnp.float32,
        _pick_tile_g(shard_rows),
    )
    queries = jnp.asarray(np.asarray(idx._device_embeds)[:QUERY_BATCH])

    def make_loop(iters):
        # gallery enters as an explicit jit argument (not a closure constant:
        # the axon remote-compile tunnel serializes closed-over constants
        # into the compile payload and 413s on a 400MB gallery)
        def run(q, g):
            def body(_, carry):
                acc, bump = carry
                v, i = step(q + bump, g)
                s = jnp.sum(v) + jnp.sum(i).astype(jnp.float32)
                return acc + s, s * 0e-30

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, 0.0))
            return acc

        return run

    dt = _loop_time(make_loop, queries, idx._device_embeds, n1=10, n2=50)
    return QUERY_BATCH / dt


def bench_merge_8shard(n_dev: int = 8):
    """Cross-shard merge cost at DEPLOYMENT width (VERDICT r4 #4): run the
    product merge (index/gallery.py::merge_shard_candidates) on synthetic
    8-shard candidate blocks — the exact (n_dev, Q, k) tensor an 8-chip mesh
    all-gathers — on this one chip. Returns merge seconds per search call.
    The ICI transfer it replaces is n_dev*Q*k*(4+4) bytes (640 KB at
    Q=1024, k=10) — sub-10us at v5e ICI bandwidth, so the on-chip merge
    compute measured here IS the merge cost bound."""
    from xmir_tpu.index.gallery import merge_shard_candidates

    rng = np.random.default_rng(0)
    vals = jnp.asarray(
        rng.standard_normal((n_dev, QUERY_BATCH, K)).astype(np.float32)
    )
    idxs = jnp.asarray(
        rng.integers(0, GALLERY_N, (n_dev, QUERY_BATCH, K)).astype(np.int32)
    )

    def make_loop(iters):
        def run(v, i):
            def body(_, carry):
                acc, bump = carry
                mv, mi = merge_shard_candidates(v + bump, i, n_dev, K)
                s = jnp.sum(mv) + jnp.sum(mi).astype(jnp.float32)
                return acc + s, s * 0e-30

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, 0.0))
            return acc

        return run

    return _loop_time(make_loop, vals, idxs, n1=20, n2=100)


def _densenet_bf16(batch: int):
    """(model, bf16 variables, bf16 input batch) — shared by the embed and
    XAI benches so they measure the same tower configuration."""
    from xmir_tpu.models import create_model

    model, _ = create_model("densenet121", embedding_dim=128)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )
    return model, variables, x32.astype(jnp.bfloat16)


def bench_embed():
    model, variables, x = _densenet_bf16(EMBED_BATCH)

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

    dt = _loop_time(make_loop, variables, x)
    return EMBED_BATCH / dt


def bench_search_bf16():
    import jax.numpy as jnp

    from xmir_tpu.ops.topk_pallas import fused_topk

    rng = np.random.default_rng(0)
    gallery = jnp.asarray(rng.standard_normal((GALLERY_N, DIM)).astype(np.float32))
    gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)
    queries = gallery[:QUERY_BATCH]

    def make_loop(iters):
        def run(q, g):
            def body(_, carry):
                acc, bump = carry
                vals, idxs = fused_topk(
                    q + bump, g, K, metric="ip", tile_q=512, tile_g=2048,
                    compute_dtype=jnp.bfloat16,
                )
                s = jnp.sum(vals) + jnp.sum(idxs).astype(jnp.float32)
                return acc + s, s * 0e-30
            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, 0.0))
            return acc
        return run

    dt = _loop_time(make_loop, queries, gallery, n1=10, n2=50)
    return QUERY_BATCH / dt


def bench_sbsm(batch: int = 4):
    """SBSM self-saliency maps/sec: DenseNet121@224 bf16 with the reference
    mask grid (window 24, stride 5 -> 49x49 = 2,401 masks/map). The reference
    runs those 2,401 masked forwards per map fanned over GPUs with DataParallel
    (explanations.py:105-152, README.md:76); here the mask stack streams
    through lax.map chunks of one jitted embed on a single chip."""
    from xmir_tpu.xai.sbsm import generate_masks, sbsm_self_saliency

    model, variables, x = _densenet_bf16(batch)
    masks = jnp.asarray(generate_masks(224, window_size=24, stride=5))
    assert masks.shape[0] == 2401, masks.shape

    def embed_fn(v, imgs):
        return model.apply(v, imgs, train=False)["embedding"]

    def make_loop(iters):
        # masks passed as a jit argument — a 2401x224x224 closure constant
        # would be serialized into the axon remote-compile payload (HTTP 413)
        def run(v, xx, mm):
            def body(_, carry):
                acc, bump = carry
                sal = sbsm_self_saliency(embed_fn, v, xx + bump, mm, chunk=252)
                s = jnp.sum(sal).astype(jnp.float32)
                return acc + s, (s * 0e-30).astype(xx.dtype)
            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc
        return run

    dt = _loop_time(make_loop, variables, x, masks, n1=1, n2=3)
    return batch / dt


def bench_insdel(pairs: int = 8, step: int = 1000):
    """Insertion+deletion causal-metric pair-evals/sec at step=1000 on 224^2
    images (both curves per pair; blur substrate for insertion, zeros for
    deletion — the reference's defaults; pairs=8 keeps the round-4 metric
    definition). The reference embeds one image per reveal step per pair
    serially (evaluation.py:46-138); here BOTH curves stack along the pair
    axis and every (step x pair) cell is batched through one jitted embed
    with auto-tuned chunking — the exact computation
    xai.causal.run_causal_metric_pairs_both serves in the evaluate_saliency
    CLI (r4 profile: the old fixed batch_steps=8 single-mode calls ran
    batch-64 forwards at 46% of raw embed rate; the r5 sweep pins batch-128
    multiple-of-8 forwards as the measured peak, xai/causal.py
    auto_batch_steps)."""
    from xmir_tpu.xai.causal import (
        auto_batch_steps,
        blur_substrate,
        causal_scores_batch,
        saliency_rank,
        zeros_substrate,
    )

    model, variables, x = _densenet_bf16(pairs)
    rng = np.random.default_rng(1)
    sal = jnp.asarray(rng.random((pairs, 224 * 224)), jnp.float32)
    ranks1 = jax.vmap(saliency_rank)(sal)
    ranks = jnp.concatenate([ranks1, ranks1], axis=0)
    blur = blur_substrate()
    bs = auto_batch_steps(224 * 224, step, 2 * pairs)

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
                starts = jnp.concatenate([xi, bsub + bump], axis=0)
                finishes = jnp.concatenate([zsub, xi], axis=0)
                s_both = causal_scores_batch(
                    embed_fn, v, q_feat, starts, finishes, ranks, step,
                    batch_steps=bs,
                )
                s = jnp.sum(s_both).astype(jnp.float32)
                return acc + s, (s * 0e-30).astype(xx.dtype)

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, jnp.bfloat16(0)))
            return acc
        return run

    dt = _loop_time(make_loop, variables, x, n1=1, n2=3)
    return pairs / dt


def bench_host_cached(n_files: int = 2048, size: int = 224):
    """Cached-path host throughput: decode-once uint8 memmap artifact served
    by DecodedCache (data/cache.py) — the repeated-pass ingest/eval path."""
    import tempfile

    from xmir_tpu.data.cache import DecodedCache, build_decoded_cache

    class _Synth:
        def __init__(self, n, rng):
            self.labels = [0] * n
            self._rng = rng
            self._n = n

        def __len__(self):
            return self._n

        def load_image(self, i):
            return (self._rng.random((size, size, 3)) * 255).astype(np.uint8)

    tmp = tempfile.mkdtemp(prefix="xmir_bench_cache_")
    cache_dir = build_decoded_cache(
        _Synth(n_files, np.random.default_rng(0)), tmp, size, num_workers=8
    )
    cache = DecodedCache(cache_dir)
    for _ in cache.iter_batches(64):  # warm page cache
        pass
    t0 = time.perf_counter()
    n = sum(b[0].shape[0] for b in cache.iter_batches(64))
    dt = time.perf_counter() - t0
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return n / dt


def bench_host_writethrough(n_files: int = 1024, size: int = 224):
    """Write-through cache overlap (VERDICT r4 #7): epoch-1 throughput with
    the cache filling as a side effect of the pipeline pass vs epoch-2
    memcpy-serve, and vs the serial decode-then-train build it replaces
    (build wall + a full re-read). Returns (epoch1, epoch2, serial_effective)
    img/s on this host."""
    import shutil
    import tempfile

    from xmir_tpu.data.cache import WriteThroughCache, build_decoded_cache
    from xmir_tpu.data.pipeline import batch_iterator

    class _Synth:
        def __init__(self, n, seed):
            self.labels = [0] * n
            self._n = n
            self._seed = seed

        def __len__(self):
            return self._n

        def load_image(self, i):
            rng = np.random.default_rng(self._seed + i)
            return (rng.random((size, size, 3)) * 255).astype(np.uint8)

    def one_pass(ds):
        t0 = time.perf_counter()
        n = sum(
            b[0].shape[0]
            for b in batch_iterator(ds, 64, image_size=size, num_workers=8)
        )
        return n / (time.perf_counter() - t0)

    tmp = tempfile.mkdtemp(prefix="xmir_bench_wt_")
    try:
        wt = WriteThroughCache(_Synth(n_files, 7), os.path.join(tmp, "wt"), size)
        epoch1 = one_pass(wt)  # decode + write-back overlapped
        epoch2 = one_pass(wt)  # memcpy-serve
        # the serial alternative: build_decoded_cache wall time, after which
        # epoch 1 still has to read everything back
        t0 = time.perf_counter()
        d = build_decoded_cache(
            _Synth(n_files, 7), os.path.join(tmp, "serial"), size, num_workers=8
        )
        build_s = time.perf_counter() - t0
        from xmir_tpu.data.cache import DecodedCache

        serve = one_pass(DecodedCache(d))
        serial_effective = n_files / (build_s + n_files / serve)
        return epoch1, epoch2, serial_effective
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_host_pipeline(n_files: int = 768, size: int = 256, out: int = 224):
    """Host-side input pipeline: .npy decode -> normalize -> resize -> RGB
    through the native C++ loader + bounded batch_iterator (the >=10k img/s
    ingest path, SURVEY.md §7 hard parts). Returns img/s on this host."""
    import os
    import tempfile

    from xmir_tpu.data import NIHChestXrayRetrievalDataset, batch_iterator

    tmp = tempfile.mkdtemp(prefix="xmir_bench_npy_")
    rng = np.random.default_rng(0)
    for i in range(n_files):
        np.save(
            os.path.join(tmp, f"Chest_X-ray_Atelectasis_{i:05d}.npy"),
            (rng.random((size, size)) * 1000).astype(np.float32),
        )
    ds = NIHChestXrayRetrievalDataset(data_dir=tmp)
    # warm one pass (page cache), then time
    for _ in batch_iterator(ds, 64, image_size=out, num_workers=8):
        pass
    t0 = time.perf_counter()
    n = sum(
        b[0].shape[0] for b in batch_iterator(ds, 64, image_size=out, num_workers=8)
    )
    dt = time.perf_counter() - t0
    for f in os.listdir(tmp):
        os.unlink(os.path.join(tmp, f))
    os.rmdir(tmp)
    return n / dt


def bench_towers(names):
    """Per-tower embed img/s via tools/bench_towers.bench_embed (identical
    jaxpr -> hits the persistent compile cache warmed by tooling runs).
    Each tower is individually fault-isolated."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_towers import bench_embed as tower_embed

    out = {}
    for name in names:
        if not name:
            continue
        try:
            out[f"embed_images_per_sec_{name}_bf16"] = round(tower_embed(name), 1)
        except Exception:
            out[f"embed_images_per_sec_{name}_bf16"] = None
    return out


def bench_train_towers(names):
    """fwd+bwd+Adam img/s (the reference train_epoch hot loop) via
    tools/bench_towers.bench_train: bf16 mixed precision with the Pallas
    attention backward. Fault-isolated per tower like bench_towers."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_towers import bench_train as tower_train

    out = {}
    for name in names:
        if not name:
            continue
        try:
            out[f"train_images_per_sec_{name}_bf16"] = round(tower_train(name), 1)
        except Exception:
            out[f"train_images_per_sec_{name}_bf16"] = None
    return out


def main():
    n_chips = jax.device_count()
    on_tpu = jax.devices()[0].platform == "tpu"
    # headline: median-of-N with spread (VERDICT r3 #6 — single-shot QPS
    # spans ~20% run-to-run; round-over-round deltas need the spread to be
    # interpretable). First sample pays compile; all reuse the jit cache.
    n_samples = int(os.environ.get("XMIR_BENCH_SAMPLES", "3"))
    samples = []
    kernel = None
    for _ in range(max(1, n_samples)):
        q, kernel = bench_search(on_tpu)
        samples.append(q)
    qps = float(np.median(samples))
    try:
        qps_bf16 = bench_search_bf16() if on_tpu else None
    except Exception:
        qps_bf16 = None
    try:
        # median-of-N like the headline: the sharded-vs-meshless delta is
        # only interpretable with the spread (VERDICT r4 #4)
        sharded_samples = (
            [bench_search_sharded() for _ in range(max(1, n_samples))]
            if on_tpu else []
        )
        qps_sharded = float(np.median(sharded_samples)) if sharded_samples else None
    except Exception:
        sharded_samples = []
        qps_sharded = None
    try:
        merge_s = bench_merge_8shard() if on_tpu else None
    except Exception:
        merge_s = None
    try:
        ips = bench_embed()
    except Exception:
        ips = None
    sbsm_mps = insdel_pps = insdel_pps16 = None
    if on_tpu and os.environ.get("XMIR_BENCH_XAI", "1") != "0":
        try:
            sbsm_mps = bench_sbsm()
        except Exception:
            pass
        try:
            insdel_pps = bench_insdel()
        except Exception:
            pass
        try:
            # 16 concurrent pairs -> the auto tuner's waste-free batch-128
            # chunking (2*16 x 4); the pairs=8 headline keeps the round-4
            # metric definition for comparability
            insdel_pps16 = bench_insdel(pairs=16)
        except Exception:
            pass
    try:
        host_ips = bench_host_pipeline()
    except Exception:
        host_ips = None
    try:
        host_cached_ips = bench_host_cached()
    except Exception:
        host_cached_ips = None
    try:
        wt_e1, wt_e2, wt_serial = bench_host_writethrough()
    except Exception:
        wt_e1 = wt_e2 = wt_serial = None
    # per-tower embed extras (VERDICT r2 ask); skippable / extendable via
    # XMIR_BENCH_TOWERS="dinov2,swinv2,..." or "" to disable
    towers = {}
    if on_tpu:
        names = os.environ.get(
            "XMIR_BENCH_TOWERS", "dinov2,convnextv2,swinv2"
        ).split(",")
        towers = bench_towers(names)
        train_names = os.environ.get(
            "XMIR_BENCH_TRAIN", "densenet121,convnextv2,dinov2,swinv2"
        ).split(",")
        towers.update(bench_train_towers(train_names))

    per_chip_target = TARGET_QPS_V5E8 / 8.0 * n_chips
    result = {
        "metric": "exact_top10_qps_100k_gallery",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / per_chip_target, 3),
        "extras": {
            "qps_spread": {
                "median": round(float(np.median(samples)), 1),
                "min": round(float(np.min(samples)), 1),
                "max": round(float(np.max(samples)), 1),
                "n": len(samples),
            },
            "qps_sharded_1dev_mesh_pallas": (
                None if qps_sharded is None else round(qps_sharded, 1)
            ),
            "qps_sharded_spread": (
                None if not sharded_samples else {
                    "min": round(float(np.min(sharded_samples)), 1),
                    "max": round(float(np.max(sharded_samples)), 1),
                    "n": len(sharded_samples),
                }
            ),
            "merge_8shard_ms_per_call": (
                None if merge_s is None else round(merge_s * 1e3, 3)
            ),
            "qps_bf16_serving_mode": None if qps_bf16 is None else round(qps_bf16, 1),
            "embed_images_per_sec_densenet121_bf16": None if ips is None else round(ips, 1),
            "sbsm_maps_per_sec": None if sbsm_mps is None else round(sbsm_mps, 2),
            "insdel_pairs_per_sec": None if insdel_pps is None else round(insdel_pps, 2),
            "insdel_pairs_per_sec_p16": (
                None if insdel_pps16 is None else round(insdel_pps16, 2)
            ),
            **towers,
            "embed_target_per_chip": TARGET_IPS_V5E8 / 8.0 * n_chips,
            "host_pipeline_npy_img_per_sec": (
                None if host_ips is None else round(host_ips, 1)
            ),
            "host_pipeline_cached_img_per_sec": (
                None if host_cached_ips is None else round(host_cached_ips, 1)
            ),
            "host_writethrough_epoch1_img_per_sec": (
                None if wt_e1 is None else round(wt_e1, 1)
            ),
            "host_writethrough_epoch2_img_per_sec": (
                None if wt_e2 is None else round(wt_e2, 1)
            ),
            "host_serial_build_then_serve_img_per_sec": (
                None if wt_serial is None else round(wt_serial, 1)
            ),
            # the host pipeline saturates its cores (native C++ decode
            # threads); on this 1-CPU bench host the number is core-bound
            "host_cpus": os.cpu_count(),
            "kernel": kernel,
            "n_chips": n_chips,
            "platform": jax.devices()[0].platform,
            "gallery": GALLERY_N,
            "dim": DIM,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
