"""ShardedGalleryIndex tests: exactness vs brute force, multi-device sharding
on the 8-device CPU mesh, metadata search, save/load round-trip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.index import ShardedGalleryIndex
from xmir_tpu.ops.distance import scores
from xmir_tpu.parallel import make_mesh


def brute(q, g, k, metric="cosine"):
    s = np.asarray(scores(jnp.asarray(q), jnp.asarray(g), metric))
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


@pytest.fixture
def data(rng):
    g = rng.standard_normal((500, 64)).astype(np.float32)
    q = rng.standard_normal((13, 64)).astype(np.float32)
    labels = rng.integers(0, 3, 500)
    paths = [f"img_{i}.png" for i in range(500)]
    return q, g, labels, paths


class TestSingleDevice:
    def test_exact_search(self, data):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        vals, ids = idx.search(q, k=10)
        bv, bi = brute(q, g, 10)
        np.testing.assert_array_equal(np.asarray(ids), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-5)

    def test_incremental_add(self, data):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g[:200], labels[:200], paths[:200])
        idx.add(g[200:], labels[200:], paths[200:])
        idx.build()
        assert idx.ntotal == 500
        _, ids = idx.search(q, k=5)
        _, bi = brute(q, g, 5)
        np.testing.assert_array_equal(np.asarray(ids), bi)

    def test_self_exclusion(self, data):
        _, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        _, ids = idx.search(g[:20], k=5, exclude_ids=np.arange(20))
        ids = np.asarray(ids)
        for i in range(20):
            assert i not in ids[i]

    def test_metadata_results(self, data):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        res = idx.search_with_metadata(q[:2], k=3)
        assert len(res) == 2 and len(res[0]) == 3
        hit = res[0][0]
        assert set(hit) == {"id", "image_path", "label", "distance", "similarity"}
        assert hit["image_path"] == f"img_{hit['id']}.png"
        # cosine conversion: distance = 1 - sim
        assert hit["distance"] == pytest.approx(1.0 - hit["similarity"], abs=1e-6)

    def test_save_load_roundtrip(self, data, tmp_path):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        p = str(tmp_path / "gallery.npz")
        idx.save(p)
        idx2 = ShardedGalleryIndex.load(p)
        assert idx2.ntotal == 500
        v1, i1 = idx.search(q, k=5)
        v2, i2 = idx2.search(q, k=5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_dim_mismatch_raises(self):
        idx = ShardedGalleryIndex(32)
        with pytest.raises(ValueError):
            idx.add(np.zeros((4, 64), np.float32))

    def test_full_ranking(self, data):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        s, ranks = idx.full_ranking(q[:3])
        assert s.shape == (3, 500)
        bs = np.asarray(scores(jnp.asarray(q[:3]), jnp.asarray(g), "cosine"))
        np.testing.assert_array_equal(
            np.asarray(ranks), np.argsort(-bs, axis=1, kind="stable")
        )

    def test_full_ranking_is_device_resident(self, data):
        """After build(), full_ranking must use the device copy — never the
        host staging lists (no per-call H2D gallery re-upload)."""
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build()
        expect_s, expect_r = idx.full_ranking(q[:2])
        idx._staged = None  # poison host staging: any touch now raises
        s, ranks = idx.full_ranking(q[:2])
        np.testing.assert_array_equal(np.asarray(ranks), np.asarray(expect_r))
        np.testing.assert_allclose(np.asarray(s), np.asarray(expect_s))


class TestShardedSearch:
    def test_matches_single_device_8way(self, data):
        q, g, labels, paths = data
        assert jax.device_count() == 8, "conftest must provide 8 cpu devices"
        mesh = make_mesh()
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        idx.build(mesh)
        vals, ids = idx.search(q, k=10)
        bv, bi = brute(q, g, 10)
        np.testing.assert_array_equal(np.asarray(ids), bi)
        np.testing.assert_allclose(np.asarray(vals), bv, atol=1e-5)

    def test_uneven_shards(self, rng):
        # N not divisible by 8 -> padded rows must never be returned
        g = rng.standard_normal((501, 32)).astype(np.float32)
        q = rng.standard_normal((5, 32)).astype(np.float32)
        mesh = make_mesh()
        idx = ShardedGalleryIndex(32)
        idx.add(g)
        idx.build(mesh)
        vals, ids = idx.search(q, k=7)
        bv, bi = brute(q, g, 7)
        np.testing.assert_array_equal(np.asarray(ids), bi)
        assert np.asarray(ids).max() < 501

    def test_k_larger_than_shard(self, rng):
        # k > rows per shard exercises the per-shard padding path
        g = rng.standard_normal((64, 16)).astype(np.float32)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        mesh = make_mesh()
        idx = ShardedGalleryIndex(16)
        idx.add(g)
        idx.build(mesh)
        vals, ids = idx.search(q, k=20)  # 8 shards x 8 rows each
        bv, bi = brute(q, g, 20)
        np.testing.assert_array_equal(np.asarray(ids), bi)

    @pytest.mark.parametrize("metric", ["ip", "l2", "hamming"])
    def test_other_metrics_sharded(self, rng, metric):
        g = rng.standard_normal((200, 32)).astype(np.float32)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        mesh = make_mesh()
        idx = ShardedGalleryIndex(32, metric=metric)
        idx.add(g)
        idx.build(mesh)
        _, ids = idx.search(q, k=5)
        _, bi = brute(q, g, 5, metric)
        np.testing.assert_array_equal(np.asarray(ids), bi)


class TestShardedPallasDispatch:
    """The deployment shape (VERDICT r3 #1): the sharded search path must run
    the SAME fused Pallas kernel the meshless path serves with, composed under
    shard_map. On the CPU mesh the kernel runs in interpret mode; results must
    be bit-identical to the XLA tiled_topk path."""

    def _both_modes(self, monkeypatch, q, g, k, metric, mesh):
        outs = {}
        for mode in ("0", "interpret"):
            monkeypatch.setenv("XMIR_GALLERY_PALLAS", mode)
            idx = ShardedGalleryIndex(g.shape[1], metric=metric)
            idx.add(g)
            idx.build(mesh)
            v, i = idx.search(q, k=k)
            outs[mode] = (np.asarray(v), np.asarray(i))
        return outs

    @pytest.mark.parametrize("metric", ["cosine", "ip", "l2", "hamming"])
    def test_sharded_pallas_bitmatches_xla(self, rng, monkeypatch, metric):
        g = rng.standard_normal((333, 48)).astype(np.float32)
        q = rng.standard_normal((6, 48)).astype(np.float32)
        outs = self._both_modes(monkeypatch, q, g, 10, metric, make_mesh())
        (xv, xi), (pv, pi) = outs["0"], outs["interpret"]
        np.testing.assert_array_equal(pi, xi)
        np.testing.assert_allclose(pv, xv, rtol=1e-5, atol=1e-5)

    def test_sharded_pallas_uneven(self, rng, monkeypatch):
        # 67 rows over 8 x 128-aligned shards: only shard 0 holds real rows
        # (67 of 128); every other shard is all-padding (valid_count 0) and
        # must contribute nothing but -inf slots to the merge
        g = rng.standard_normal((67, 32)).astype(np.float32)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        outs = self._both_modes(monkeypatch, q, g, 12, "cosine", make_mesh())
        (xv, xi), (pv, pi) = outs["0"], outs["interpret"]
        np.testing.assert_array_equal(pi, xi)
        np.testing.assert_allclose(pv, xv, rtol=1e-5, atol=1e-5)
        bv, bi = brute(q, g, 12)
        np.testing.assert_array_equal(pi, bi)

    def test_sharded_pallas_k_over_shard_rows(self, rng, monkeypatch):
        # build() 128-aligns shards, so the kk<k pad-to-k branch of
        # local_search needs k > 128: 200 rows over 8 shards of 128 with
        # k=150 forces kk=128 on every shard plus 22 -inf pad slots, and the
        # real rows span two shards (128 + 72) so the merge must interleave
        g = rng.standard_normal((200, 32)).astype(np.float32)
        q = rng.standard_normal((3, 32)).astype(np.float32)
        outs = self._both_modes(monkeypatch, q, g, 150, "cosine", make_mesh())
        (xv, xi), (pv, pi) = outs["0"], outs["interpret"]
        np.testing.assert_array_equal(pi, xi)
        np.testing.assert_allclose(pv, xv, rtol=1e-5, atol=1e-5)
        bv, bi = brute(q, g, 150)
        np.testing.assert_array_equal(pi, bi)

    def test_meshless_interpret_matches_brute(self, rng, monkeypatch):
        # the same env knob drives the meshless path through the kernel
        g = rng.standard_normal((130, 24)).astype(np.float32)
        q = rng.standard_normal((3, 24)).astype(np.float32)
        monkeypatch.setenv("XMIR_GALLERY_PALLAS", "interpret")
        idx = ShardedGalleryIndex(24)
        idx.add(g)
        idx.build()
        v, i = idx.search(q, k=5)
        bv, bi = brute(q, g, 5)
        np.testing.assert_array_equal(np.asarray(i), bi)
        np.testing.assert_allclose(np.asarray(v), bv, atol=1e-5)


class TestInfo:
    def test_info_diagnostics(self, data):
        q, g, labels, paths = data
        idx = ShardedGalleryIndex(64)
        idx.add(g, labels, paths)
        assert idx.info()["built"] is False
        idx.build()
        info = idx.info()
        assert info["ntotal"] == 500 and info["index_type"] == "FLAT_EXACT"
        assert info["hbm_bytes"] == 500 * 64 * 4
        mesh = make_mesh()
        idx.build(mesh)
        info = idx.info()
        assert info["sharding"]["devices"] == 8


class TestPathRemap:
    def test_remap_paths(self, rng, tmp_path):
        """Reference milvus/path_mapper.py role: rewrite stored prefixes."""
        from xmir_tpu.index import ShardedGalleryIndex

        idx = ShardedGalleryIndex(8)
        idx.add(
            rng.standard_normal((4, 8)).astype(np.float32),
            labels=[0, 1, 0, 1],
            paths=[f"/kaggle/input/covid/im{i}.png" for i in range(3)]
            + ["/other/x.png"],
        )
        n = idx.remap_paths("/kaggle/input", "/data")
        assert n == 3
        assert idx.paths[0] == "/data/covid/im0.png"
        assert idx.paths[3] == "/other/x.png"


class TestBenchUsesServedPath:
    """VERDICT r4 #4 drift guard: bench.py times
    index/gallery.py::make_sharded_search_step — this pins that the step
    function IS the served computation: calling it directly must reproduce
    ShardedGalleryIndex.search() exactly on the same built index."""

    def test_step_function_matches_index_search(self, rng, monkeypatch):
        import jax

        from xmir_tpu.index.gallery import (
            _pick_tile_g,
            make_sharded_search_step,
        )
        from xmir_tpu.parallel import make_mesh

        monkeypatch.setenv("XMIR_GALLERY_PALLAS", "interpret")
        g = rng.standard_normal((1000, 64)).astype(np.float32)
        q = rng.standard_normal((16, 64)).astype(np.float32)
        mesh = make_mesh((8,), axis_names=("data",))
        idx = ShardedGalleryIndex(64, metric="ip")
        idx.add(g)
        idx.build(mesh)
        vals, ids = idx.search(q, k=7)

        shard_rows = idx._device_embeds.shape[0] // 8
        step = make_sharded_search_step(
            mesh, 7, shard_rows, idx._n, "interpret", "ip", idx.dtype,
            _pick_tile_g(shard_rows),
        )
        v2, i2 = jax.jit(step)(jnp.asarray(q, idx.dtype), idx._device_embeds)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(v2))


class TestCrossShardTies:
    """The merge drops the index argsort (round 5): ties must STILL break to
    the lower gallery index both within a shard and across shards, because
    lax.top_k picks the first position and candidates are block-major."""

    @pytest.mark.parametrize("mode", ["0", "interpret"])
    def test_planted_duplicates_break_to_lower_index(self, rng, monkeypatch, mode):
        monkeypatch.setenv("XMIR_GALLERY_PALLAS", mode)
        n, d = 1024, 32
        g = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        q = rng.standard_normal((2, d)).astype(np.float32)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        # same-shard duplicate pair (shard 0 holds rows 0..127)
        g[5] = g[40] = 3.0 * qn[0]
        # cross-shard duplicate pair (rows 200 and 900 are different shards)
        g[200] = g[900] = 2.0 * qn[0]
        mesh = make_mesh((8,), axis_names=("data",))
        idx = ShardedGalleryIndex(d, metric="ip")
        idx.add(g)
        idx.build(mesh)
        vals, ids = idx.search(q, k=4)
        ids = np.asarray(ids)
        assert list(ids[0]) == [5, 40, 200, 900]
        # and the full result equals the meshless index bit-for-bit
        idx1 = ShardedGalleryIndex(d, metric="ip")
        idx1.add(g)
        idx1.build()
        v1, i1 = idx1.search(q, k=4)
        np.testing.assert_array_equal(ids, np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(v1))
