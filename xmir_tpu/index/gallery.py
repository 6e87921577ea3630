"""ShardedGalleryIndex — the HBM-resident replacement for Milvus/Zilliz.

The reference stores gallery embeddings in an external vector database reached
over gRPC (milvus/milvus_setup.py:116-137) and searches with approximate IVF
indexes (nlist=1024, nprobe=10). Here the gallery lives as a device array
sharded row-wise over the mesh `data` axis; search is an EXACT fused
similarity+top-K (ops/topk_pallas.py on TPU, ops/topk.py everywhere), and the
cross-shard merge is one small top-K over n_dev*k candidates. Labels and
image paths stay host-side, mirroring the Milvus scalar fields
(milvus_setup.py:169-176 schema: id | image_path | label | embedding).

Metrics: cosine / ip / l2 / hamming, matching MilvusManager's COSINE/L2/IP
(milvus_setup.py:191-222) plus the faiss/Hamming ATH path (ATH.py:398-431).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import exclude_self_topk, tiled_topk
from ..ops.topk_pallas import fused_topk, fused_topk_masked
from ..parallel.mesh import DATA_AXIS, gallery_sharding

_DISTANCE_CONVERSIONS = {
    # score -> (distance, similarity) per metric, matching
    # milvus/milvus_retrieval.py:94-109
    "cosine": lambda s: (1.0 - s, s),
    "ip": lambda s: (-s, s),
    "l2": lambda s: (-s, 1.0 / (1.0 + (-s))),
    "hamming": lambda s: (-s, 1.0 - (-s)),
}


def _pick_tile_g(shard_rows: int) -> int:
    """Largest multiple-of-128 divisor of the (128-aligned) shard row count
    in [512, 2048]: a tile that divides the shard exactly keeps the fused
    kernel's padded shape equal to the stored shape (zero-copy fast path,
    ops/topk_pallas.py), and a round-3 sweep measured tile_g in this band
    within run-to-run noise. Falls back to the default 2048 (pad-copy path)
    when the shard has no such divisor."""
    for tg in range(2048, 511, -128):
        if shard_rows % tg == 0:
            return tg
    return 2048


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel_mode() -> str:
    """Search-kernel dispatch for BOTH the meshless and the sharded path.

    Returns 'pallas' (compiled fused kernel — the TPU deployment shape),
    'interpret' (fused kernel in interpret mode — CPU meshes: tests and the
    driver's multichip dryrun), or 'xla' (lax.scan tiled_topk).
    XMIR_GALLERY_PALLAS overrides: '0' -> xla, 'interpret' -> interpret,
    '1' -> pallas; unset -> pallas on TPU else xla.
    """
    flag = os.environ.get("XMIR_GALLERY_PALLAS", "")
    if flag == "0":
        return "xla"
    if flag == "interpret":
        return "interpret"
    if flag == "1":
        return "pallas"
    return "pallas" if _use_pallas() else "xla"


def make_local_shard_search(
    mode: str, k: int, shard_rows: int, n_real: int, metric: str,
    compute_dtype, tile_g: int,
):
    """Per-shard local top-k body run under shard_map — shared VERBATIM by
    ShardedGalleryIndex._search_sharded (the served path) and bench.py's
    sharded-search benchmark, so the benchmarked code cannot drift from the
    served code. q: (Q, D) replicated, g_shard: (shard_rows, D) — returns
    (vals (Q, k), global idxs (Q, k)) for this shard."""

    def local_search(q, g_shard):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        base = shard_id * shard_rows
        valid = jnp.clip(n_real - base, 0, shard_rows)
        kk = min(k, shard_rows)
        if mode != "xla":
            # queries enter replicated (P() in_spec) while the gallery
            # shard is device-varying; mark them varying so the kernel's
            # mixed inputs type-check under shard_map's vma tracking
            qv = jax.lax.pcast(q, (DATA_AXIS,), to="varying")
            vals, idxs = fused_topk_masked(
                qv, g_shard, kk, valid, metric,
                tile_q=512, tile_g=tile_g,
                compute_dtype=compute_dtype,
                interpret=(mode == "interpret"),
                out_vma=(DATA_AXIS,),
            )
        else:
            vals, idxs = tiled_topk(
                q, g_shard, kk, metric=metric, valid_count=valid,
                pvary_axis=DATA_AXIS,
            )
        if kk < k:  # pad so every shard returns k candidates
            pad = k - kk
            vals = jnp.concatenate(
                [vals, jnp.full((vals.shape[0], pad), -jnp.inf)], axis=1
            )
            idxs = jnp.concatenate(
                [idxs, jnp.zeros((idxs.shape[0], pad), jnp.int32)], axis=1
            )
        return vals, idxs + base

    return local_search


def merge_shard_candidates(vals, idxs, n_dev: int, k: int):
    """Cross-shard candidate merge: (n_dev, Q, k) per-shard top-k blocks ->
    global (Q, k), preserving the reference's stable-argsort tie semantics
    (equal scores break to the LOWER gallery index, test.py:1081).

    No index sort is needed: lax.top_k breaks ties by FIRST position, and
    the block-major candidate layout already orders equal values by gallery
    index — within a shard block the local kernel ranks equal scores
    lower-index-first (ops/topk_pallas.py / ops/topk.py tie rule), and
    across blocks shard s only holds indices in [s*rows, (s+1)*rows), so an
    earlier block IS a lower index. Dropping the (Q, n_dev*k) argsort + two
    gathers cut the measured 8-shard merge from 1.39 ms to the cost of one
    top_k (bench.py::bench_merge_8shard; tie semantics pinned by the
    planted-duplicate tests and the multichip dryrun). Shared by the served
    path and the benchmark."""
    q = vals.shape[1]
    vals = vals.transpose(1, 0, 2).reshape(q, n_dev * k)
    idxs = idxs.transpose(1, 0, 2).reshape(q, n_dev * k)
    v, pos = jax.lax.top_k(vals, k)
    i = jnp.take_along_axis(idxs, pos, axis=1)
    return v, i


def make_sharded_search_step(
    mesh, k: int, shard_rows: int, n_real: int, mode: str, metric: str,
    compute_dtype, tile_g: int,
):
    """The full sharded search step (per-shard fused top-k under shard_map +
    cross-shard merge) as ONE pure function of (queries, embeds) — the exact
    served computation, unjitted so bench.py can wrap it in an on-device
    timing loop (the axon tunnel defeats host-side block_until_ready)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[DATA_AXIS]
    local_search = make_local_shard_search(
        mode, k, shard_rows, n_real, metric, compute_dtype, tile_g
    )
    f = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )

    def search_fn(queries, embeds):
        vals, idxs = f(queries, embeds)  # (n_dev*Q, k) stacked
        q = queries.shape[0]
        return merge_shard_candidates(
            vals.reshape(n_dev, q, k), idxs.reshape(n_dev, q, k), n_dev, k
        )

    return search_fn


def build_sharded_search_fn(
    mesh, k: int, shard_rows: int, n_real: int, mode: str, metric: str,
    compute_dtype, tile_g: int,
):
    """make_sharded_search_step jitted into ONE dispatch. This IS the served
    path: ShardedGalleryIndex._search_sharded calls it (cached per
    (k, mode, metric))."""
    return jax.jit(make_sharded_search_step(
        mesh, k, shard_rows, n_real, mode, metric, compute_dtype, tile_g
    ))


class ShardedGalleryIndex:
    """In-HBM exact vector index.

    Usage:
      idx = ShardedGalleryIndex(dim=1024, metric="cosine")
      idx.add(embeddings, labels=..., paths=...)   # host-side staging
      idx.build(mesh=None)                          # device placement
      vals, ids = idx.search(queries, k=10)
      hits = idx.search_with_metadata(queries, k=10)
    """

    def __init__(self, dim: int, metric: str = "cosine", dtype=jnp.float32):
        self.dim = dim
        self.metric = metric
        self.dtype = dtype
        self._staged: List[np.ndarray] = []
        self._labels: List = []
        self._paths: List[str] = []
        self._device_embeds = None
        self._mesh = None
        self._n = 0
        self._search_fns = {}  # (k, mode, metric) -> jitted sharded search

    # ------------------------------------------------------------- ingest
    def add(
        self,
        embeddings: np.ndarray,
        labels: Optional[Sequence] = None,
        paths: Optional[Sequence[str]] = None,
    ):
        embeddings = np.asarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2 or embeddings.shape[1] != self.dim:
            raise ValueError(
                f"expected (N, {self.dim}) embeddings, got {embeddings.shape}"
            )
        n = embeddings.shape[0]
        self._staged.append(embeddings)
        self._labels.extend(labels if labels is not None else [None] * n)
        self._paths.extend(paths if paths is not None else [""] * n)
        self._device_embeds = None  # invalidate built state

    @property
    def ntotal(self) -> int:
        return sum(a.shape[0] for a in self._staged)

    @property
    def labels(self) -> np.ndarray:
        return np.asarray(self._labels)

    @property
    def paths(self) -> List[str]:
        return list(self._paths)

    # ------------------------------------------------------------- build
    def build(self, mesh=None):
        """Concatenate staged rows and place them in device HBM, sharded
        row-wise over the mesh `data` axis when a mesh is given."""
        if not self._staged:
            raise ValueError("index is empty")
        host = np.concatenate(self._staged, axis=0)
        # Fold the metric's per-gallery-row transform into the build: cosine
        # normalization / hamming sign-binarization are row-local, so doing
        # them once here deletes a full-gallery VPU+HBM pass from EVERY
        # search call (inside shard_map XLA cannot hoist it out of serving
        # loops). Queries get the same transform per call in search(); the
        # kernels then run plain inner-product. The raw staged rows are kept
        # for save()/reconstruction.
        if self.metric == "cosine":
            host = host / np.maximum(
                np.linalg.norm(host, axis=1, keepdims=True), 1e-12
            )
        elif self.metric == "hamming":
            host = np.where(host >= 0, 1.0, -1.0).astype(host.dtype)
        self._n = host.shape[0]
        self._mesh = mesh
        self._search_fns = {}  # n_real/shard layout baked into cached fns
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            # 128-align each shard: the fused kernel's padded gallery shape
            # then equals the stored shape, so the per-call pad copy inside
            # shard_map (which XLA cannot hoist out of serving loops) becomes
            # a zero-copy pass-through (ops/topk_pallas.py fast path). The
            # masked kernel's per-row -inf bias keeps the pad rows unselectable.
            shard = -(-self._n // n_data)
            shard = ((shard + 127) // 128) * 128
            pad = shard * n_data - self._n
            if pad:
                host = np.concatenate(
                    [host, np.zeros((pad, self.dim), host.dtype)], axis=0
                )
            self._device_embeds = jax.device_put(
                jnp.asarray(host, self.dtype), gallery_sharding(mesh)
            )
        else:
            self._device_embeds = jnp.asarray(host, self.dtype)
        return self

    def _require_built(self):
        if self._device_embeds is None:
            self.build(self._mesh)

    # ------------------------------------------------------------- search
    def search(self, queries, k: int, exclude_ids=None):
        """Exact top-k. Returns (values (Q, k) f32, indices (Q, k) i32).

        exclude_ids: optional (Q,) gallery ids to drop per query (self-match
        exclusion for in-gallery queries; reference test.py:1081 semantics).
        """
        self._require_built()
        if k > self._n:
            raise ValueError(f"k={k} > index size {self._n}")
        queries = jnp.asarray(queries, self.dtype)
        # build() pre-applied the gallery-side metric transform; apply the
        # query-side half here and run the kernels on plain inner-product
        # (cosine scores == ip of normalized vectors; hamming rides an
        # increasing affine map of the ±1 dot, applied after the merge so
        # cross-shard candidate ordering is unchanged)
        kmetric = self.metric
        if self.metric == "cosine":
            queries = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
            )
            kmetric = "ip"
        elif self.metric == "hamming":
            queries = jnp.where(queries >= 0, 1.0, -1.0).astype(self.dtype)
            kmetric = "ip"
        fetch = k + 1 if exclude_ids is not None else k
        fetch = min(fetch, self._n)
        mode = _kernel_mode()
        if self._mesh is not None:
            vals, idxs = self._search_sharded(queries, fetch, mode, kmetric=kmetric)
        elif mode != "xla":
            vals, idxs = fused_topk(
                queries, self._device_embeds, fetch, kmetric,
                compute_dtype=self.dtype, interpret=(mode == "interpret"),
            )
        else:
            vals, idxs = tiled_topk(
                queries, self._device_embeds, fetch, metric=kmetric,
                valid_count=self._n,
            )
        if self.metric == "hamming":
            vals = jnp.where(
                jnp.isneginf(vals), vals, -(self.dim - vals) / 2.0
            )
        if exclude_ids is not None:
            vals, idxs = exclude_self_topk(vals, idxs, exclude_ids, k)
        return vals, idxs

    def _search_sharded(self, queries, k: int, mode: str = "xla", kmetric=None):
        """Per-shard local top-k via shard_map, then a tiny cross-shard merge
        (make_local_shard_search + merge_shard_candidates, jitted as one
        dispatch by build_sharded_search_fn and cached per (k, mode, metric)).

        No (Q, N) matrix and no full-gallery gather ever materializes; the
        inter-device traffic is exactly n_dev * Q * k (value, index) pairs.

        ``mode`` selects the per-shard local search kernel: 'pallas' runs the
        fused Pallas similarity+top-K (the TPU deployment shape — the same
        kernel the meshless path serves with, composed under shard_map),
        'interpret' the same kernel in interpret mode (CPU meshes), 'xla' the
        lax.scan tiled_topk. Results are identical across modes; shard-local
        validity of the padded last shard rides the kernel's per-row score
        bias (ops/topk_pallas.py::fused_topk_masked).

        ``kmetric`` is the kernel-level metric: search() pre-transforms
        queries/gallery for cosine (normalize) and hamming (binarize) and
        dispatches their "ip" form here so no per-call full-gallery transform
        runs inside the region; direct callers may omit it (build() already
        transformed the gallery, and the per-call re-transform is idempotent).
        """
        embeds = self._device_embeds
        mesh = self._mesh
        n_dev = mesh.shape[DATA_AXIS]
        shard_rows = embeds.shape[0] // n_dev
        # search() dispatches the already-transformed "ip" form for
        # cosine/hamming; direct callers (tests, bench) get the raw metric
        metric = self.metric if kmetric is None else kmetric
        from ..ops.distance import resolve_precision

        # precision rides the env (XMIR_TOPK_PRECISION) and is resolved at
        # trace time inside the kernels — key the cached dispatch on it so
        # an env flip between searches re-traces instead of serving stale
        key = (k, mode, metric, str(resolve_precision(None)))
        fn = self._search_fns.get(key)
        if fn is None:
            fn = build_sharded_search_fn(
                mesh, k, shard_rows, self._n, mode, metric, self.dtype,
                _pick_tile_g(shard_rows),
            )
            self._search_fns[key] = fn
        return fn(queries, embeds)

    def full_ranking(self, queries):
        """(Q, N) scores + ranks — the reference's top_k=0 full-gallery mode
        (query_nih_zilliz.py:53). Materializes O(Q*N).

        Runs against the BUILT device copy — no host re-staging or H2D
        re-upload per call. Under a mesh the (Q, N) score product is computed
        shard-local over the data axis (each device scores its own gallery
        rows) and only then concatenated column-wise for the argsort."""
        from ..ops.distance import scores as score_fn
        from ..ops.topk import full_ranking

        self._require_built()
        q = jnp.asarray(queries, self.dtype)
        if self._mesh is None:
            return full_ranking(q, self._device_embeds, self.metric)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        metric = self.metric
        f = shard_map(
            lambda qq, g_shard: score_fn(qq, g_shard, metric),
            mesh=self._mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=P(None, DATA_AXIS),
        )
        s = f(q, self._device_embeds)[:, : self._n]  # drop shard padding
        ranks = jnp.argsort(-s, axis=1, stable=True)
        return s, ranks

    def search_with_metadata(self, queries, k: int):
        """MilvusRetriever.search-compatible results
        (milvus/milvus_retrieval.py:79-120): list of per-query hit lists of
        {image_path, label, distance, similarity, id}."""
        vals, idxs = self.search(queries, k)
        vals = np.asarray(vals)
        idxs = np.asarray(idxs)
        convert = _DISTANCE_CONVERSIONS[self.metric]
        labels = self.labels
        results = []
        for qi in range(vals.shape[0]):
            hits = []
            for v, i in zip(vals[qi], idxs[qi]):
                dist, sim = convert(float(v))
                hits.append(
                    {
                        "id": int(i),
                        "image_path": self._paths[int(i)],
                        "label": labels[int(i)].item()
                        if hasattr(labels[int(i)], "item")
                        else labels[int(i)],
                        "distance": dist,
                        "similarity": sim,
                    }
                )
            results.append(hits)
        return results

    def info(self) -> dict:
        """Index diagnostics (reference check_milvus_index.py prints index
        params/metric; here: size, dim, metric, dtype, sharding layout)."""
        built = self._device_embeds is not None
        out = {
            "ntotal": self.ntotal,
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(jnp.dtype(self.dtype)),
            "built": built,
            "index_type": "FLAT_EXACT",  # vs reference IVF_FLAT/HNSW
        }
        if built and self._mesh is not None:
            n_dev = self._mesh.shape[DATA_AXIS]
            out["sharding"] = {
                "devices": n_dev,
                "rows_per_shard": self._device_embeds.shape[0] // n_dev,
            }
        elif built:
            out["sharding"] = {"devices": 1, "rows_per_shard": self._n}
        if built:
            out["hbm_bytes"] = int(
                self._device_embeds.size * self._device_embeds.dtype.itemsize
            )
        return out

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        """npz artifact (embeddings/labels/paths + metadata json)."""
        self._require_built()
        embeds = np.concatenate(self._staged, axis=0)
        np.savez(
            path,
            embeds=embeds,
            labels=np.asarray(self._labels),
            paths=np.asarray(self._paths),
            meta=json.dumps({"dim": self.dim, "metric": self.metric}),
        )

    def remap_paths(self, old_prefix: str, new_prefix: str) -> int:
        """Rewrite stored gallery path prefixes (the reference's
        milvus/path_mapper.py role: Kaggle `/kaggle/input/...` artifacts
        replayed on a local filesystem). Returns the number of paths
        rewritten."""
        changed = 0
        out = []
        for p in self._paths:
            if p.startswith(old_prefix):
                out.append(new_prefix + p[len(old_prefix):])
                changed += 1
            else:
                out.append(p)
        self._paths = out
        return changed

    @classmethod
    def load(cls, path: str, mesh=None):
        data = np.load(path, allow_pickle=True)
        meta = json.loads(str(data["meta"]))
        idx = cls(dim=meta["dim"], metric=meta["metric"])
        idx.add(
            data["embeds"],
            labels=list(data["labels"]),
            paths=[str(p) for p in data["paths"]],
        )
        idx.build(mesh)
        return idx
