"""Decode-once uint8 cache (data/cache.py): build -> serve -> pipeline
compatibility."""
import numpy as np
import pytest

from xmir_tpu.data.cache import DecodedCache, build_decoded_cache


class _FakeDataset:
    def __init__(self, images, labels):
        self.images = images
        self.labels = labels

    def __len__(self):
        return len(self.images)

    def load_image(self, i):
        return self.images[i]


@pytest.fixture
def dataset(rng):
    images = [
        rng.integers(0, 255, (40 + 3 * i, 64, 3)).astype(np.uint8)
        for i in range(9)
    ]
    return _FakeDataset(images, list(range(9)))


class TestDecodedCache:
    def test_build_and_serve(self, dataset, tmp_path, rng):
        d = build_decoded_cache(dataset, str(tmp_path / "c"), 32, batch_size=4)
        cache = DecodedCache(d)
        assert len(cache) == 9
        assert cache.load_image(3).shape == (32, 32, 3)
        # cached content equals a fresh decode of the same item
        from xmir_tpu.data.transforms import pil_resize_center_crop

        fresh = pil_resize_center_crop(dataset.load_image(3), 32)
        np.testing.assert_array_equal(cache.load_image(3), fresh)
        assert list(cache.labels) == list(range(9))

    def test_batch_fast_path_and_size_guard(self, dataset, tmp_path):
        d = build_decoded_cache(dataset, str(tmp_path / "c"), 32, batch_size=4)
        cache = DecodedCache(d)
        batch = cache.load_batch_cropped([1, 4, 7], 32)
        assert batch.shape == (3, 32, 32, 3)
        with pytest.raises(ValueError):
            cache.load_batch_cropped([0], 48)

    def test_pipeline_uses_cache_fast_path(self, dataset, tmp_path):
        from xmir_tpu.data.pipeline import batch_iterator

        d = build_decoded_cache(dataset, str(tmp_path / "c"), 32, batch_size=4)
        cache = DecodedCache(d)
        got = list(batch_iterator(cache, 4, image_size=32, num_workers=2))
        n = sum(b[0].shape[0] for b in got)
        assert n == 9
        assert got[0][0].dtype == np.uint8

    def test_iter_batches(self, dataset, tmp_path):
        d = build_decoded_cache(dataset, str(tmp_path / "c"), 32, batch_size=4)
        cache = DecodedCache(d)
        chunks = list(cache.iter_batches(4))
        assert sum(c[0].shape[0] for c in chunks) == 9
        np.testing.assert_array_equal(chunks[0][0][1], cache.load_image(1))


class TestWriteThroughCache:
    """Epoch-1 overlap (VERDICT r4 #7): the cache fills as a side effect of
    the first pipeline pass and serves from the memmap afterwards."""

    def test_first_pass_fills_and_matches_fresh_decode(self, dataset, tmp_path):
        from xmir_tpu.data.cache import WriteThroughCache
        from xmir_tpu.data.pipeline import batch_iterator
        from xmir_tpu.data.transforms import pil_resize_center_crop

        wt = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        assert not wt.complete
        seen = {}
        for imgs, labs, idxs in batch_iterator(wt, 4, image_size=32,
                                               num_workers=2):
            for j, i in enumerate(np.asarray(idxs)):
                seen[int(i)] = imgs[j]
        assert len(seen) == 9 and wt.complete
        for i in range(9):
            fresh = pil_resize_center_crop(dataset.load_image(i), 32)
            np.testing.assert_array_equal(seen[i], fresh)
            np.testing.assert_array_equal(np.asarray(wt.images[i]), fresh)
        # completion stamped the artifact: DecodedCache can load it
        from xmir_tpu.data.cache import DecodedCache

        cache = DecodedCache(str(tmp_path / "c"))
        np.testing.assert_array_equal(
            cache.load_image(5), pil_resize_center_crop(dataset.load_image(5), 32)
        )

    def test_second_pass_serves_without_decoding(self, dataset, tmp_path):
        from xmir_tpu.data.cache import WriteThroughCache

        wt = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        wt.finalize()
        assert wt.complete
        # sabotage the raw dataset: any further decode would now raise
        dataset.images = [None] * 9
        batch = wt.load_batch_cropped([0, 3, 8], 32)
        assert batch.shape == (3, 32, 32, 3)

    def test_reopen_completed_cache(self, dataset, tmp_path):
        from xmir_tpu.data.cache import WriteThroughCache

        WriteThroughCache(dataset, str(tmp_path / "c"), 32).finalize()
        wt2 = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        assert wt2.complete  # meta.json -> everything marked done

    def test_partial_coverage_then_finalize(self, dataset, tmp_path):
        from xmir_tpu.data.cache import WriteThroughCache

        wt = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        wt.load_batch_cropped([0, 1, 2], 32)
        assert not wt.complete
        wt.finalize()
        assert wt.complete

    def test_size_guard_and_label_passthrough(self, dataset, tmp_path):
        from xmir_tpu.data.cache import WriteThroughCache

        wt = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        with pytest.raises(ValueError):
            wt.load_batch_cropped([0], 48)
        assert list(wt.labels) == list(range(9))
        assert len(wt) == 9

    def test_duplicate_indices_do_not_overcount(self, dataset, tmp_path):
        """PK-sampled batches repeat indices; duplicates must not inflate the
        done-count and finalize the artifact before full coverage."""
        import os

        from xmir_tpu.data.cache import WriteThroughCache

        wt = WriteThroughCache(dataset, str(tmp_path / "c"), 32)
        wt.load_batch_cropped([0, 0, 1, 1, 2, 2, 3, 3, 4], 32)
        assert wt._n_done == 5
        assert not wt.complete
        assert not os.path.exists(str(tmp_path / "c" / "meta.json"))
        wt.load_batch_cropped([5, 6, 7, 8, 8], 32)
        assert wt.complete
        assert os.path.exists(str(tmp_path / "c" / "meta.json"))
