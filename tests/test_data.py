"""Data layer tests: manifest parsing semantics (incl. reference bug fixes),
transforms vs PIL/torchvision behavior, pipeline integrity."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from xmir_tpu.data import (
    CovidxDataset,
    ISICDataset,
    NIHChestXrayRetrievalDataset,
    SyntheticImageDataset,
    TBX11kDataset,
    VinDrConceptCLIPDataset,
    VinDrDataset,
    batch_iterator,
    embed_dataset,
    eval_preprocess,
    split_csv,
    split_txt,
    train_preprocess,
    write_synthetic_covidx,
)
from xmir_tpu.data.datasets import VINDR_ALL_COLUMNS


@pytest.fixture
def covidx_dir(tmp_path):
    img_dir, manifest = write_synthetic_covidx(str(tmp_path), n=12, size=32)
    return img_dir, manifest


class TestCovidx:
    def test_parse_and_load(self, covidx_dir):
        img_dir, manifest = covidx_dir
        ds = CovidxDataset(img_dir, manifest)
        assert len(ds) == 12
        img = ds.load_image(0)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert set(ds.labels) <= {0, 1, 2}

    def test_use_covid_false(self, covidx_dir):
        img_dir, manifest = covidx_dir
        full = CovidxDataset(img_dir, manifest)
        no_covid = CovidxDataset(img_dir, manifest, use_covid=False)
        assert len(no_covid) == len(full) - full.labels.count(2)
        assert 2 not in no_covid.labels


class TestISIC:
    def test_label_mapping(self, tmp_path):
        csv_file = tmp_path / "gt.csv"
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rows = [
            ("ISIC_001", 1.0, 0.0, 2),  # melanoma
            ("ISIC_002", 0.0, 1.0, 1),  # SK
            ("ISIC_003", 0.0, 0.0, 0),  # nevus
        ]
        with open(csv_file, "w") as f:
            f.write("image_id,melanoma,seborrheic_keratosis\n")
            for name, m, sk, _ in rows:
                f.write(f"{name},{m},{sk}\n")
                Image.new("RGB", (16, 16)).save(img_dir / f"{name}.jpg")
        ds = ISICDataset(str(img_dir), str(csv_file))
        assert ds.labels == [2, 1, 0]
        ds2 = ISICDataset(str(img_dir), str(csv_file), use_melanoma=False)
        assert ds2.labels == [1, 0]


class TestTBX11k:
    def test_bom_and_labels(self, tmp_path):
        csv_file = tmp_path / "tb.csv"
        # write with BOM and extra unknown type rows
        with open(csv_file, "w", encoding="utf-8-sig") as f:
            f.write("fname,image_type\n")
            f.write("a.png,tb\nb.png,healthy\nc.png,sick_but_no_tb\nd.png,unknown\n")
        ds = TBX11kDataset("/data", str(csv_file))
        assert ds.labels == [0, 1, 2]
        assert ds.image_names[0] == "/data/a.png"

    def test_missing_columns_raise(self, tmp_path):
        csv_file = tmp_path / "bad.csv"
        csv_file.write_text("a,b\n1,2\n")
        with pytest.raises(ValueError):
            TBX11kDataset("/data", str(csv_file))


class TestVinDr:
    def _write_csv(self, path, with_rad=True):
        cols = ",".join(VINDR_ALL_COLUMNS)
        with open(path, "w") as f:
            if with_rad:
                f.write(f"image_id,rad_id,{cols}\n")
                # two annotators for img1: union via max
                z = ["0"] * len(VINDR_ALL_COLUMNS)
                a = z.copy(); a[0] = "1"
                b = z.copy(); b[3] = "1"
                f.write("img1,R1," + ",".join(a) + "\n")
                f.write("img1,R2," + ",".join(b) + "\n")
                c = z.copy(); c[-1] = "1"
                f.write("img2,R1," + ",".join(c) + "\n")
            else:
                f.write(f"image_id,{cols}\n")
                z = ["0"] * len(VINDR_ALL_COLUMNS)
                z[1] = "1"
                f.write("imgA," + ",".join(z) + "\n")

    def test_annotator_aggregation(self, tmp_path):
        p = tmp_path / "train.csv"
        self._write_csv(p, with_rad=True)
        ds = VinDrDataset("/data", str(p))
        assert len(ds) == 2
        # img1 = union of the two annotators
        i1 = ds.image_ids.index("img1")
        assert ds.labels[i1][0] == 1.0 and ds.labels[i1][3] == 1.0

    def test_no_rad_id(self, tmp_path):
        p = tmp_path / "test.csv"
        self._write_csv(p, with_rad=False)
        ds = VinDrDataset("/data", str(p))
        assert len(ds) == 1 and ds.labels[0][1] == 1.0

    def test_conceptclip_text(self, tmp_path):
        p = tmp_path / "train.csv"
        self._write_csv(p, with_rad=True)
        ds = VinDrConceptCLIPDataset("/data", str(p))
        text, concepts = ds.get_text(ds.image_ids.index("img1"))
        assert "chest X-ray" in text.lower() or "chest x-ray" in text.lower()
        assert len(concepts) == 2  # two active concepts
        # normal image
        text2, concepts2 = ds.get_text(ds.image_ids.index("img2"))
        assert concepts2 == []
        assert "normal" in text2.lower()


class TestNIH:
    def test_filename_label_parsing(self, tmp_path):
        name = "Chest_X-ray_Atelectasis%7CCardiomegaly_00042.npy"
        np.save(tmp_path / name, np.random.default_rng(0).random((32, 32)))
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        assert len(ds) == 1
        lab = ds.labels[0]
        assert lab[0] == 1.0 and lab[1] == 1.0 and lab.sum() == 2.0
        img = ds.load_image(0)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    def test_alias_and_unknown(self, tmp_path):
        np.save(
            tmp_path / "Chest_X-ray_pleural_thickening_1.npy", np.zeros((8, 8))
        )
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        assert ds.labels[0][12] == 1.0  # Pleural Thickening index
        np.save(tmp_path / "Chest_X-ray_NotARealDisease_2.npy", np.zeros((8, 8)))
        with pytest.raises(ValueError):
            NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))


class TestSplits:
    def test_split_txt(self, tmp_path):
        src = tmp_path / "all.txt"
        src.write_text("\n".join(f"{i} img{i}.png normal" for i in range(20)) + "\n")
        ntr, nv = split_txt(src, tmp_path / "tr.txt", tmp_path / "va.txt", 0.25)
        assert (ntr, nv) == (15, 5)
        assert len((tmp_path / "va.txt").read_text().splitlines()) == 5

    def test_split_csv_keeps_header(self, tmp_path):
        src = tmp_path / "all.csv"
        src.write_text("h1,h2\n" + "\n".join(f"r{i},x" for i in range(10)) + "\n")
        split_csv(src, tmp_path / "tr.csv", tmp_path / "va.csv", 0.2)
        assert (tmp_path / "va.csv").read_text().splitlines()[0] == "h1,h2"


class TestTransforms:
    def test_eval_preprocess_matches_pil(self):
        # parity vs PIL resize-short-side + center crop on a smooth image
        rng = np.random.default_rng(0)
        img = np.zeros((64, 96, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, 96)[None, :].astype(np.uint8)
        out = eval_preprocess(
            jnp.asarray(img[None]), 32, 24, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
        )
        assert out.shape == (1, 24, 24, 3)
        pil = Image.fromarray(img).resize((48, 32), Image.BILINEAR)  # short->32
        arr = np.asarray(pil, np.float32)
        top, left = (32 - 24) // 2, (48 - 24) // 2
        ref = (arr[top : top + 24, left : left + 24] / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(np.asarray(out[0]), ref, atol=0.06)

    def test_train_preprocess_shapes_and_determinism(self):
        rng = np.random.default_rng(0)
        batch = rng.integers(0, 255, (4, 48, 48, 3), dtype=np.uint8)
        key = jax.random.PRNGKey(0)
        a = train_preprocess(key, jnp.asarray(batch), 40, 32, (0.5,)*3, (0.25,)*3)
        b = train_preprocess(key, jnp.asarray(batch), 40, 32, (0.5,)*3, (0.25,)*3)
        assert a.shape == (4, 32, 32, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = train_preprocess(
            jax.random.PRNGKey(1), jnp.asarray(batch), 40, 32, (0.5,)*3, (0.25,)*3
        )
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_rand_resize_crop(self):
        batch = np.zeros((2, 48, 48, 3), np.uint8)
        out = train_preprocess(
            jax.random.PRNGKey(0), jnp.asarray(batch), 40, 32, (0.5,)*3, (0.25,)*3,
            rand_resize=True,
        )
        assert out.shape == (2, 32, 32, 3)


class TestPipeline:
    def test_batch_iterator_order_and_labels(self):
        ds = SyntheticImageDataset(n=10, size=16)
        batches = list(batch_iterator(ds, 4, image_size=16))
        assert [b[0].shape[0] for b in batches] == [4, 4, 2]
        all_idx = np.concatenate([b[2] for b in batches])
        np.testing.assert_array_equal(all_idx, np.arange(10))
        for imgs, labs, idxs in batches:
            np.testing.assert_array_equal(
                labs, np.asarray([ds.labels[i] for i in idxs])
            )

    def test_embed_dataset(self):
        from xmir_tpu.models.registry import ModelSpec

        ds = SyntheticImageDataset(n=10, size=24)

        def fake_embed(variables, x):
            # depends on image content so ordering bugs would show
            return jnp.mean(x, axis=(1, 2))

        spec = ModelSpec("fake", None, 16, 20, 3, (0.5,)*3, (0.5,)*3)
        embeds, labels = embed_dataset(ds, fake_embed, {}, spec, batch_size=4)
        assert embeds.shape == (10, 3)
        assert labels.shape == (10,)
        # recompute first item directly
        from xmir_tpu.data import eval_preprocess as ep
        img = ds.load_image(0)
        img = np.asarray(
            Image.fromarray(img).resize((20, 20), Image.BILINEAR), np.uint8
        )
        ref = np.asarray(
            fake_embed({}, ep(jnp.asarray(img[None]), 20, 16, (0.5,)*3, (0.5,)*3))
        )[0]
        np.testing.assert_allclose(embeds[0], ref, atol=1e-5)


class TestHashTokenizer:
    def test_deterministic_and_distinct(self):
        from xmir_tpu.data.tokenizer import HashWordTokenizer

        tok = HashWordTokenizer(vocab_size=1000, max_len=16)
        ids1, m1 = tok(["a chest x-ray showing pneumonia"])
        ids2, m2 = tok(["a chest x-ray showing pneumonia"])
        np.testing.assert_array_equal(ids1, ids2)
        ids3, _ = tok(["a chest x-ray showing consolidation"])
        assert not np.array_equal(ids1, ids3)
        assert ids1[0, 0] == HashWordTokenizer.CLS
        assert (ids1 < 1000).all()

    def test_padding_and_mask(self):
        from xmir_tpu.data.tokenizer import HashWordTokenizer

        tok = HashWordTokenizer(max_len=8)
        ids, mask = tok.encode_padded(["one two", "one two three four"], 8)
        assert ids.shape == (2, 8)
        assert mask[0].sum() == 3  # CLS + 2 words
        assert mask[1].sum() == 5
        assert (ids[0, 3:] == 0).all()

    def test_token_table_override(self):
        from xmir_tpu.data.tokenizer import HashWordTokenizer

        tok = HashWordTokenizer(token_table={"pneumonia": 7})
        ids, _ = tok(["pneumonia"])
        assert ids[0, 1] == 7


class TestSkipErrors:
    def test_skip_corrupt(self, tmp_path):
        from xmir_tpu.data import CovidxDataset, batch_iterator, write_synthetic_covidx

        img_dir, manifest = write_synthetic_covidx(str(tmp_path), n=8, size=24)
        ds = CovidxDataset(img_dir, manifest)
        # corrupt one file
        with open(ds.image_names[3], "wb") as f:
            f.write(b"not an image")
        with pytest.raises(Exception):
            list(batch_iterator(ds, 4, image_size=24))
        batches = list(batch_iterator(ds, 4, image_size=24, skip_errors=True))
        total = sum(b[0].shape[0] for b in batches)
        assert total == 7  # one skipped
        all_idx = np.concatenate([b[2] for b in batches])
        assert 3 not in all_idx


class TestShardedEmbed:
    def test_mesh_sharded_eval_matches_single(self):
        """Mesh-sharded embedding extraction must equal the unsharded path —
        the DDP-eval-with-all_gather equivalence (reference train.py:600-609)."""
        from xmir_tpu.data import SyntheticImageDataset, embed_dataset
        from xmir_tpu.models.registry import ModelSpec
        from xmir_tpu.parallel import make_mesh

        ds = SyntheticImageDataset(n=20, size=24)

        def embed_fn(variables, x):
            return jnp.mean(x, axis=(1, 2))

        spec = ModelSpec("fake", None, 16, 20, 3, (0.5,)*3, (0.5,)*3)
        e1, l1 = embed_dataset(ds, embed_fn, {}, spec, batch_size=8)
        mesh = make_mesh()
        e2, l2 = embed_dataset(ds, embed_fn, {}, spec, batch_size=8, mesh=mesh)
        np.testing.assert_allclose(e1, e2, atol=1e-6)
        np.testing.assert_array_equal(l1, l2)


class TestPipelineBackpressure:
    def test_in_flight_decodes_bounded(self):
        """batch_iterator must not decode the whole dataset ahead of a slow
        consumer (round-1 finding: unbounded futures held GBs on 100k
        ingests). In-flight decoded-but-unconsumed batches stay within the
        2x-workers window."""
        import threading
        import time as _time

        from xmir_tpu.data.pipeline import batch_iterator

        lock = threading.Lock()
        state = {"decoded": 0}

        class CountingDataset:
            labels = [0] * 256

            def __len__(self):
                return 256

            def load_image(self, i):
                with lock:
                    state["decoded"] += 1
                return np.zeros((8, 8, 3), np.uint8)

        ds = CountingDataset()
        workers = 4
        max_ahead = 0
        consumed = 0
        for imgs, _, _ in batch_iterator(ds, 8, image_size=8, num_workers=workers):
            _time.sleep(0.005)  # slow consumer
            consumed += imgs.shape[0]
            with lock:
                ahead = state["decoded"] - consumed
            max_ahead = max(max_ahead, ahead)
        assert consumed == 256
        # window of 2x workers batches (+ one being yielded), in images
        assert max_ahead <= (2 * workers + 1) * 8, max_ahead


class TestSyntheticHardMode:
    def test_hard_removes_the_color_shortcut(self):
        """hard=True classes share the mean color (learning-curve mode for
        the demo/CI artifact); default classes are color-separable."""
        easy = SyntheticImageDataset(n=30, size=32, seed=1)
        hard = SyntheticImageDataset(n=30, size=32, seed=1, hard=True)

        def class_mean_colors(ds):
            sums = {}
            for i in range(len(ds)):
                sums.setdefault(ds.labels[i], []).append(
                    ds.load_image(i).mean(axis=(0, 1))
                )
            return {k: np.mean(v, axis=0) for k, v in sums.items()}

        easy_means = class_mean_colors(easy)
        hard_means = class_mean_colors(hard)
        easy_spread = np.ptp(np.stack(list(easy_means.values())), axis=0).max()
        hard_spread = np.ptp(np.stack(list(hard_means.values())), axis=0).max()
        assert easy_spread > 30, easy_spread
        assert hard_spread < 8, hard_spread
        # but the frequency pattern still separates classes for a learner:
        # per-class FFT energy at the class frequency dominates
        s = 32
        for i in range(len(hard)):
            img = hard.load_image(i).astype(np.float32).mean(axis=2)
            f = np.abs(np.fft.fft2(img - img.mean()))
            k = hard.labels[i] + 1
            assert f[k, k] == np.sort(f[:8, :8].ravel())[-1], i
