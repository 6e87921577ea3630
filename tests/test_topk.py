"""Exactness tests for the tiled/fused top-K search vs brute-force argsort."""
import numpy as np
import pytest
import jax.numpy as jnp

from xmir_tpu.ops.distance import scores
from xmir_tpu.ops.topk import exclude_self_topk, full_ranking, tiled_topk
from xmir_tpu.ops.topk_pallas import fused_topk


def brute_topk(q, g, k, metric):
    s = np.asarray(scores(jnp.asarray(q), jnp.asarray(g), metric))
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, idx


METRICS = ["cosine", "ip", "l2", "hamming"]


class TestTiledTopk:
    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_bruteforce(self, rng, metric):
        q = rng.standard_normal((17, 64)).astype(np.float32)
        g = rng.standard_normal((501, 64)).astype(np.float32)
        vals, idxs = tiled_topk(jnp.asarray(q), jnp.asarray(g), k=10, tile=128, metric=metric)
        bv, bi = brute_topk(q, g, 10, metric)
        np.testing.assert_array_equal(np.asarray(idxs), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-5)

    def test_k_equals_n(self, rng):
        q = rng.standard_normal((4, 32)).astype(np.float32)
        g = rng.standard_normal((20, 32)).astype(np.float32)
        vals, idxs = tiled_topk(jnp.asarray(q), jnp.asarray(g), k=20, tile=8, metric="cosine")
        bv, bi = brute_topk(q, g, 20, "cosine")
        np.testing.assert_array_equal(np.asarray(idxs), bi)

    def test_tie_breaking_prefers_lower_index(self):
        # duplicate gallery rows -> equal scores; lower index must come first
        g = np.ones((8, 16), dtype=np.float32)
        q = np.ones((1, 16), dtype=np.float32)
        _, idxs = tiled_topk(jnp.asarray(q), jnp.asarray(g), k=4, tile=4)
        np.testing.assert_array_equal(np.asarray(idxs)[0], [0, 1, 2, 3])

    def test_k_larger_than_n_raises(self, rng):
        q = rng.standard_normal((2, 8)).astype(np.float32)
        g = rng.standard_normal((4, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            tiled_topk(jnp.asarray(q), jnp.asarray(g), k=10)


class TestFusedPallasTopk:
    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_bruteforce_interpret(self, rng, metric):
        q = rng.standard_normal((9, 96)).astype(np.float32)
        g = rng.standard_normal((300, 96)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=7, metric=metric,
            tile_q=8, tile_g=128, interpret=True,
        )
        bv, bi = brute_topk(q, g, 7, metric)
        np.testing.assert_array_equal(np.asarray(idxs), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-4)

    def test_tie_breaking(self):
        g = np.ones((10, 16), dtype=np.float32)
        q = np.ones((2, 16), dtype=np.float32)
        _, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=3, tile_q=8, tile_g=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(idxs), [[0, 1, 2], [0, 1, 2]])

    @pytest.mark.parametrize("prec", ["default", "highest", None])
    def test_precision_knob_threads_through(self, rng, monkeypatch, prec):
        # XMIR_TOPK_PRECISION / precision= selects the score-matmul MXU
        # precision: on TPU 'default' rounds f32 inputs to bf16 (near-ties
        # below ~2^-8 relative may reorder vs float64 brute force, measured
        # 3.48x faster), 'highest' is tie-exact. On CPU both are exact; this
        # pins that every spelling compiles and agrees with brute force.
        if prec is None:
            monkeypatch.setenv("XMIR_TOPK_PRECISION", "highest")
        q = rng.standard_normal((5, 64)).astype(np.float32)
        g = rng.standard_normal((260, 64)).astype(np.float32)
        kw = {} if prec is None else {"precision": prec}
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=6, metric="cosine",
            tile_q=8, tile_g=128, interpret=True, **kw,
        )
        bv, bi = brute_topk(q, g, 6, "cosine")
        np.testing.assert_array_equal(np.asarray(idxs), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-4)

    def test_multi_tile_boundary(self, rng):
        # gallery larger than one tile; best hits placed in later tiles
        q = rng.standard_normal((3, 32)).astype(np.float32)
        g = rng.standard_normal((400, 32)).astype(np.float32) * 0.01
        g[350] = q[0] * 10  # strong hit in tile 2
        g[5] = q[1] * 10
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=1, metric="ip",
            tile_q=8, tile_g=128, interpret=True,
        )
        assert int(idxs[0, 0]) == 350
        assert int(idxs[1, 0]) == 5


class TestFullRanking:
    def test_full_ranking_matches_argsort(self, rng):
        q = rng.standard_normal((6, 16)).astype(np.float32)
        g = rng.standard_normal((30, 16)).astype(np.float32)
        s, ranks = full_ranking(jnp.asarray(q), jnp.asarray(g))
        ref = np.argsort(-np.asarray(s), axis=1, kind="stable")
        np.testing.assert_array_equal(np.asarray(ranks), ref)


class TestExcludeSelf:
    def test_removes_self(self, rng):
        e = rng.standard_normal((12, 16)).astype(np.float32)
        k = 5
        vals, idxs = tiled_topk(jnp.asarray(e), jnp.asarray(e), k=k + 1, tile=8)
        v2, i2 = exclude_self_topk(vals, idxs, jnp.arange(12), k)
        i2 = np.asarray(i2)
        for i in range(12):
            assert i not in i2[i]
        # order preserved and values still descending
        v2 = np.asarray(v2)
        assert np.all(np.diff(v2, axis=1) <= 1e-6)


class TestBf16Mode:
    def test_bf16_near_agreement(self, rng):
        from xmir_tpu.ops.topk_pallas import fused_topk_scores
        import jax.numpy as jnp

        q = rng.standard_normal((8, 64)).astype(np.float32)
        g = rng.standard_normal((300, 64)).astype(np.float32)
        bias = jnp.zeros((300,), jnp.float32)
        v32, i32 = fused_topk_scores(
            jnp.asarray(q), jnp.asarray(g), bias, 5, tile_q=8, tile_g=128,
            interpret=True,
        )
        v16, i16 = fused_topk_scores(
            jnp.asarray(q), jnp.asarray(g), bias, 5, tile_q=8, tile_g=128,
            interpret=True, compute_dtype=jnp.bfloat16,
        )
        i32, i16 = np.asarray(i32), np.asarray(i16)
        overlap = np.mean(
            [len(set(i32[r]) & set(i16[r])) / 5 for r in range(8)]
        )
        assert overlap >= 0.8  # near-ties may flip; gross agreement holds
        np.testing.assert_allclose(
            np.asarray(v16), np.asarray(v32), atol=0.1
        )


class TestPrunedAlgorithm:
    """The lane-pruned exact kernel must match the K-pass merge bit-for-bit.

    Scenarios target each internal path: spill (many candidates per lane),
    pending-union (sparse improvements), flush (cross-tile lane collisions),
    and the final pending merge.
    """

    @pytest.mark.parametrize("metric", METRICS)
    def test_matches_bruteforce_interpret(self, rng, metric):
        q = rng.standard_normal((9, 96)).astype(np.float32)
        g = rng.standard_normal((777, 96)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=7, metric=metric,
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 7, metric)
        np.testing.assert_array_equal(np.asarray(idxs), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-4)

    def test_massive_ties_spill_path(self, rng):
        # quantized scores -> duplicates everywhere; exercises spill + the
        # lower-index tie-break on every tile
        q = np.ones((4, 32), dtype=np.float32)
        g = rng.integers(0, 3, size=(520, 32)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=10, metric="ip",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 10, "ip")
        np.testing.assert_array_equal(np.asarray(idxs), bi)

    def test_ascending_scores_constant_updates(self):
        # every later element beats the buffer -> candidates on every tile
        q = np.ones((3, 16), dtype=np.float32)
        g = np.arange(600, dtype=np.float32)[:, None] * np.ones((1, 16), np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=5, metric="ip",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        np.testing.assert_array_equal(np.asarray(idxs)[0], [599, 598, 597, 596, 595])

    def test_descending_scores_prunes_everything(self):
        # first tile fills the buffer; every later tile is fully pruned
        q = np.ones((3, 16), dtype=np.float32)
        g = np.arange(600, 0, -1, dtype=np.float32)[:, None] * np.ones((1, 16), np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=5, metric="ip",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        np.testing.assert_array_equal(np.asarray(idxs)[0], [0, 1, 2, 3, 4])

    def test_sparse_improvements_pending_path(self, rng):
        # mostly-flat gallery with isolated strong hits spread across tiles:
        # hits survive pruning as lone lane candidates (pending/union path)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        g = rng.standard_normal((1024, 32)).astype(np.float32) * 0.01
        hot = [3, 131, 259, 390, 523, 650, 777, 901, 1000]
        for h, scale in zip(hot, range(2, 20, 2)):
            g[h] = q[h % 4] * float(scale)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=6, metric="ip",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 6, "ip")
        np.testing.assert_array_equal(np.asarray(idxs), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-4)

    def test_single_tile_gallery(self, rng):
        q = rng.standard_normal((5, 24)).astype(np.float32)
        g = rng.standard_normal((100, 24)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=10, metric="cosine",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 10, "cosine")
        np.testing.assert_array_equal(np.asarray(idxs), bi)

    def test_large_k_and_ragged_tail(self, rng):
        # k near the lane width plus a gallery that is not a tile multiple
        q = rng.standard_normal((3, 48)).astype(np.float32)
        g = rng.standard_normal((333, 48)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=100, metric="ip",
            tile_q=8, tile_g=128, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 100, "ip")
        np.testing.assert_array_equal(np.asarray(idxs), bi)

    def test_k_over_128_rejected(self, rng):
        q = rng.standard_normal((2, 16)).astype(np.float32)
        g = rng.standard_normal((300, 16)).astype(np.float32)
        with pytest.raises(ValueError):
            fused_topk(
                jnp.asarray(q), jnp.asarray(g), k=129, metric="ip",
                interpret=True, algorithm="pruned",
            )

    def test_vmem_clamp_preserves_lane_chunk_invariant(self, rng):
        # a user tile_g of 1920 (15*128) with d=2048 exceeds the pruned VMEM
        # budget at tile_q=512 and halves to 960 — NOT a multiple of 128.
        # The clamp must re-round to 896 so the chunk scan covers every
        # column; before the fix the ragged 64 trailing columns of each tile
        # were silently dropped (wrong top-K, no error).
        q = rng.standard_normal((4, 2048)).astype(np.float32)
        g = rng.standard_normal((2000, 2048)).astype(np.float32) * 0.01
        # plant the best hits inside what would be the dropped tail columns
        for h in (950, 1910):
            g[h] = q[h % 4] * 5.0
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=4, metric="ip",
            tile_q=512, tile_g=1920, interpret=True, algorithm="pruned",
        )
        bv, bi = brute_topk(q, g, 4, "ip")
        np.testing.assert_array_equal(np.asarray(idxs), bi)

    def test_auto_selects_merge_for_large_k(self, rng):
        q = rng.standard_normal((2, 16)).astype(np.float32)
        g = rng.standard_normal((300, 16)).astype(np.float32)
        vals, idxs = fused_topk(
            jnp.asarray(q), jnp.asarray(g), k=200, metric="ip",
            tile_q=8, tile_g=128, interpret=True,
        )
        bv, bi = brute_topk(q, g, 200, "ip")
        np.testing.assert_array_equal(np.asarray(idxs), bi)
