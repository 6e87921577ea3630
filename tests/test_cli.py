"""End-to-end CLI tests on the synthetic dataset (CPU). Mirrors the
reference's quick-subset smoke evals (test_eval_conceptclip.py:30-31) — the
full flow with random-init weights on a tiny dataset."""
import json
import os

import jax
import numpy as np
import pytest


class TestEvalCLI:
    def test_test_cli_end_to_end(self, tmp_path):
        from xmir_tpu.cli import test as test_cli

        metrics = test_cli.main(
            [
                "--dataset", "synthetic", "--model", "densenet121",
                "--embedding-dim", "32", "--eval-batch-size", "16",
                "--save-dir", str(tmp_path),
            ]
        )
        assert "mAP" in metrics and "R@1" in metrics
        data = np.load(tmp_path / "evaluation_results.npz", allow_pickle=True)
        assert data["embeds"].shape[1] == 32
        saved = json.loads(str(data["metrics"]))
        assert saved["mAP"] == pytest.approx(metrics["mAP"])


class TestIngestQueryCLI:
    @pytest.mark.slow
    def test_ingest_then_query(self, tmp_path):
        from xmir_tpu.cli import ingest as ingest_cli
        from xmir_tpu.cli import query as query_cli

        gal = str(tmp_path / "gallery.npz")
        ingest_cli.main(
            [
                "--dataset", "synthetic", "--model", "densenet121",
                "--embedding-dim", "32", "--split", "train",
                "--batch-size", "16", "--output", gal,
            ]
        )
        assert os.path.exists(gal)
        out = str(tmp_path / "hits.json")
        query_cli.main(
            [
                "--dataset", "synthetic", "--model", "densenet121",
                "--embedding-dim", "32", "--index", gal, "--top-k", "3",
                "--batch-size", "16", "--output", out,
            ]
        )
        results = json.load(open(out))
        assert len(results) == 32  # synthetic test split size
        hit = results[0]["results"][0]
        assert set(hit) == {"id", "image_path", "label", "distance", "similarity"}

    def test_ingest_query_use_mesh_matches(self, tmp_path):
        """--use-mesh on ingest (sharded-batch embedding) and query (sharded
        index + sharded query embedding) must reproduce the meshless
        pipeline on the 8-device CPU mesh (tiny model for speed)."""
        from xmir_tpu.cli import ingest as ingest_cli
        from xmir_tpu.cli import query as query_cli

        common = ["--dataset", "synthetic", "--model", "tiny",
                  "--embedding-dim", "16", "--batch-size", "16"]
        outs = {}
        for name, extra in (("plain", []), ("mesh", ["--use-mesh"])):
            gal = str(tmp_path / f"g_{name}.npz")
            ingest_cli.main(
                common + ["--split", "train", "--output", gal] + extra
            )
            out = str(tmp_path / f"h_{name}.json")
            query_cli.main(common + [
                "--index", gal, "--top-k", "3", "--output", out,
            ] + extra)
            outs[name] = json.load(open(out))
        for r0, r1 in zip(outs["plain"], outs["mesh"]):
            assert [h["id"] for h in r0["results"]] == [
                h["id"] for h in r1["results"]
            ]
            for h0, h1 in zip(r0["results"], r1["results"]):
                assert h1["similarity"] == pytest.approx(
                    h0["similarity"], abs=1e-5
                )


class TestChestmirCLI:
    def test_chestmir_eval_cli(self, tmp_path, rng):
        from xmir_tpu.cli import chestmir_eval

        centers = rng.standard_normal((2, 16)) * 3
        labels = np.repeat([0, 1], 8)
        g = centers[labels] + rng.standard_normal((16, 16)) * 0.3
        shared = {0: rng.standard_normal(8), 1: rng.standard_normal(8)}
        regions = [
            [{"label": "Consolidation", "box": [0, 0, 4, 4],
              "vector": shared[int(l)]}]
            for l in labels
        ]
        gal = str(tmp_path / "cm.npz")
        chestmir_eval.save_chestmir_npz(
            gal, g, labels, [f"im{i}" for i in range(16)], regions
        )
        out = str(tmp_path / "cm.json")
        chestmir_eval.main(
            ["--gallery", gal, "--specific-lesions", "consolidation",
             "--output", out]
        )
        res = json.load(open(out))
        assert "stage1_global" in res and "stage2_consolidation" in res
        assert res["stage1_global"]["report"]["R@K"]["1"] == 100.0


class TestFusionCompareCLI:
    def test_fusion_cli(self, tmp_path, rng):
        from xmir_tpu.cli import fusion as fusion_cli

        centers = rng.standard_normal((3, 16)) * 3
        labels = np.arange(30) % 3
        paths = np.asarray([f"p{i}" for i in range(30)])
        for name, noise in (("a.npz", 0.4), ("b.npz", 0.4)):
            e = (centers[labels] + rng.standard_normal((30, 16)) * noise).astype(
                np.float32
            )
            np.savez(tmp_path / name, embeds=e, labels=labels, paths=paths)
        res = fusion_cli.main(
            ["--source-a", str(tmp_path / "a.npz"),
             "--source-b", str(tmp_path / "b.npz"),
             "--alphas", "0.5",
             "--output", str(tmp_path / "fusion")]
        )
        assert "concat_fusion" in res
        assert (tmp_path / "fusion.csv").exists()

    def test_compare_cli(self, tmp_path, rng):
        from xmir_tpu.cli import compare as compare_cli
        from xmir_tpu.index import ShardedGalleryIndex

        centers = rng.standard_normal((3, 16)) * 3
        labels = np.arange(30) % 3
        paths = [f"p{i}" for i in range(30)]
        e = (centers[labels] + rng.standard_normal((30, 16)) * 0.3).astype(np.float32)
        for name, emb in (("ia.npz", e), ("ib.npz",
                          rng.standard_normal((30, 16)).astype(np.float32))):
            idx = ShardedGalleryIndex(16)
            idx.add(emb, labels, paths)
            idx.build()
            idx.save(str(tmp_path / name))
        np.savez(tmp_path / "q.npz", embeds=e, labels=labels,
                 paths=np.asarray(paths))
        groups = compare_cli.main(
            ["--index-a", str(tmp_path / "ia.npz"),
             "--index-b", str(tmp_path / "ib.npz"),
             "--queries-a", str(tmp_path / "q.npz"),
             "--out-dir", str(tmp_path / "cmp"), "--html"]
        )
        assert sum(len(v) for v in groups.values()) == 30
        assert (tmp_path / "cmp" / "mismatches.html").exists()


class TestEvaluateQueryCLI:
    def test_single_and_multilabel(self, tmp_path):
        from xmir_tpu.cli import evaluate_query

        # single-label: first query perfect, second all wrong
        single = [
            {"query_label": 1, "results": [{"label": 1}, {"label": 1}]},
            {"query_label": 0, "results": [{"label": 1}, {"label": 2}]},
        ]
        p = tmp_path / "s.json"
        p.write_text(json.dumps(single))
        m = evaluate_query.main(["--results", str(p), "--k-values", "1,2"])
        assert m["mAP"] == pytest.approx(50.0)
        assert m["P@2"] == pytest.approx(50.0)
        assert m["R@1"] == pytest.approx(50.0)

        # multilabel: jaccard 0.5 > 0.4 counts as relevant
        multi = [
            {"query_label": [1, 1, 0],
             "results": [{"label": [1, 0, 0]}, {"label": [0, 0, 1]}]},
        ]
        p2 = tmp_path / "m.json"
        p2.write_text(json.dumps(multi))
        m2 = evaluate_query.main(["--results", str(p2), "--k-values", "1,2"])
        assert m2["R@1"] == pytest.approx(100.0)  # jaccard([110],[100])=0.5
        assert m2["P@2"] == pytest.approx(50.0)


class TestTrainCLI:
    def test_resume_matches_uninterrupted(self, tmp_path):
        """Train 2 epochs, stop, resume to 4 -> bit-identical final state to
        an uninterrupted 4-epoch run (full-state resume: params + opt_state +
        step + epoch; closes the reference's restart-at-epoch-1 deficiency,
        train.py:767-778)."""
        from flax import serialization

        from xmir_tpu.cli import train as train_cli

        def run(save_dir, epochs, resume=""):
            argv = [
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--labels-per-batch", "2",
                "--samples-per-label", "8", "--epochs", str(epochs),
                "--eval-freq", "100", "--ckpt-every", "1", "--workers", "2",
                "--lr", "0.01", "--seed", "3", "--save-dir", str(save_dir),
            ]
            if resume:
                argv += ["--resume", resume]
            train_cli.main(argv)

        full = tmp_path / "full"
        inter = tmp_path / "interrupted"
        run(full, 4)
        run(inter, 2)
        ckpt2 = inter / "synthetic_tiny_embed_16_seed_3_epoch_2_ckpt.msgpack"
        assert ckpt2.exists()
        run(inter, 4, resume=str(ckpt2))

        name4 = "synthetic_tiny_embed_16_seed_3_epoch_4_ckpt.msgpack"
        a = serialization.msgpack_restore((full / name4).read_bytes())
        b = serialization.msgpack_restore((inter / name4).read_bytes())
        assert a["epoch"] == b["epoch"] == 4
        leaves_a = jax.tree_util.tree_leaves(a["params"])
        leaves_b = jax.tree_util.tree_leaves(b["params"])
        assert leaves_a and len(leaves_a) == len(leaves_b)
        for x, y in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree_util.tree_leaves(a["opt_state"]),
            jax.tree_util.tree_leaves(b["opt_state"]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_fsdp_mesh_train_smoke(self, tmp_path):
        """--use-mesh --fsdp on the 8-device CPU mesh: params + Adam moments
        shard over the data axis and training still checkpoints a valid
        state."""
        from xmir_tpu.cli import train as train_cli

        train_cli.main([
            "--dataset", "synthetic", "--model", "tiny",
            "--embedding-dim", "16", "--labels-per-batch", "2",
            "--samples-per-label", "8", "--epochs", "1",
            "--eval-freq", "100", "--ckpt-every", "1", "--workers", "2",
            "--lr", "0.01", "--seed", "3", "--save-dir", str(tmp_path),
            "--use-mesh", "--fsdp",
        ])
        ckpt = tmp_path / "synthetic_tiny_embed_16_seed_3_epoch_1_ckpt.msgpack"
        assert ckpt.exists()

    def test_cache_dir_write_through(self, tmp_path):
        """--cache-dir: epoch 1 fills the decoded cache as a side effect of
        training (VERDICT r4 #7); a second run serves from the completed
        artifact and trains to the same checkpoint as an uncached run."""
        from flax import serialization

        from xmir_tpu.cli import train as train_cli

        def run(save_dir, cache=""):
            argv = [
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--labels-per-batch", "2",
                "--samples-per-label", "8", "--epochs", "1",
                "--eval-freq", "100", "--ckpt-every", "1", "--workers", "2",
                "--lr", "0.01", "--seed", "3", "--save-dir", str(save_dir),
                "--use-random-sampler",
            ]
            if cache:
                argv += ["--cache-dir", cache]
            train_cli.main(argv)

        cache = str(tmp_path / "cache")
        run(tmp_path / "plain")
        run(tmp_path / "cached1", cache)
        # random sampler visits every index once -> cache completed in-pass
        assert (tmp_path / "cache" / "meta.json").exists()
        run(tmp_path / "cached2", cache)  # second run: memcpy-serve path
        name = "synthetic_tiny_embed_16_seed_3_epoch_1_ckpt.msgpack"
        ref = serialization.msgpack_restore((tmp_path / "plain" / name).read_bytes())
        for d in ("cached1", "cached2"):
            got = serialization.msgpack_restore((tmp_path / d / name).read_bytes())
            for x, y in zip(
                jax.tree_util.tree_leaves(ref["params"]),
                jax.tree_util.tree_leaves(got["params"]),
            ):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_nonfinite_loss_aborts(self, tmp_path):
        """Emergency halt on divergence (reference train.py:332-336)."""
        from xmir_tpu.cli import train as train_cli

        with pytest.raises(ValueError, match="non-finite"):
            train_cli.main([
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--labels-per-batch", "2",
                "--samples-per-label", "4", "--epochs", "3",
                "--loss-name", "triplet_hard", "--margin", "10",
                "--eval-freq", "100", "--workers", "2", "--print-freq", "1",
                "--lr", "1e12", "--seed", "0",  # diverges immediately
                "--save-dir", str(tmp_path),
            ])


class TestTextCLIs:
    """WordPiece --vocab plumbing through the dual-encoder train/eval CLIs
    (VERDICT item 3: real tokenizer reachable from ConceptCLIP/MedSigLIP
    train/eval entry points)."""

    VOCAB = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "a", "chest", "x", "-", "ray", "showing", "no", "evidence", "of",
        "pneumonia", "or", "covid", "19", "infection", ".", "findings",
        "consistent", "with",
    ]

    def _vocab_file(self, tmp_path):
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(self.VOCAB) + "\n", encoding="utf-8")
        return str(p)

    def test_medsiglip_vocab_train_then_zeroshot(self, tmp_path):
        from xmir_tpu.cli import train_medsiglip, zeroshot

        vocab = self._vocab_file(tmp_path)
        ck = str(tmp_path / "ms.msgpack")
        train_medsiglip.main([
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "8",
            "--dim", "32", "--depth", "2", "--image-size", "28",
            "--seq-len", "16", "--vocab-size", "64", "--vocab", vocab,
            "--save", ck,
        ])
        res = zeroshot.main([
            "--dataset", "synthetic", "--model", "tiny",
            "--embedding-dim", "32", "--dual-checkpoint", ck,
            "--vocab", vocab, "--seq-len", "16", "--text-dim", "32",
            "--text-depth", "2", "--text-vocab-size", "64",
            "--eval-batch-size", "16",
        ])
        assert 0.0 <= res["accuracy"] <= 1.0
        assert len(res["class_names"]) == 3

    def test_conceptclip_vocab_smoke(self, tmp_path):
        from xmir_tpu.cli import train_conceptclip

        vocab = self._vocab_file(tmp_path)
        train_conceptclip.main([
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "6",
            "--image-size", "28", "--dim", "32", "--depth", "2",
            "--text-depth", "2", "--seq-len", "16", "--concept-len", "8",
            "--max-concepts", "2", "--vocab-size", "64", "--vocab", vocab,
            "--save", str(tmp_path / "cc.msgpack"),
        ])


class TestConceptXAICLI:
    def test_smoke_synthetic(self, tmp_path):
        from xmir_tpu.cli import xai_conceptclip

        results = xai_conceptclip.main([
            "--dataset", "synthetic", "--image-size", "28", "--dim", "32",
            "--depth", "2", "--text-depth", "2", "--seq-len", "16",
            "--vocab-size", "64", "--batch-size", "8", "--num-images", "12",
            "--top-k", "3", "--num-query-samples", "2",
            "--out-dir", str(tmp_path),
        ])
        assert len(results) == 2
        r = results[0]
        assert len(r["retrieved"]) == 3
        assert len(r["query_top_concepts"]) == 5
        files = list(tmp_path.glob("*_explanation.json"))
        assert len(files) == 2


class TestEvaluateSaliencyCLI:
    """Inline explainers in the ins/del driver (reference
    evaluate_test_dataset_milvus.py:368-426 selects any explainer inline)."""

    @pytest.mark.parametrize("explainer,extra", [
        ("sbsm", ["--window-size", "24", "--stride", "16"]),
        ("simatt", []),
        ("simcam", []),
    ])
    def test_inline_explainers(self, tmp_path, explainer, extra):
        from xmir_tpu.cli import evaluate_saliency

        out = str(tmp_path / f"{explainer}.json")
        evaluate_saliency.main([
            "--dataset", "synthetic", "--model", "tiny",
            "--embedding-dim", "16", "--explainer", explainer,
            "--top-k", "2", "--limit", "2", "--step", "2000",
            "--save-every", "1", "--output", out,
        ] + extra)
        res = json.load(open(out))
        assert len(res["results"]) == 2
        r = res["results"][0]
        assert 0.0 <= r["deletion_auc"] <= 1.0
        assert 0.0 <= r["insertion_auc"] <= 1.0
        assert len(r["per_pair_del"]) == 2
        assert "mean_deletion_auc" in res["summary"]
        # per-class aggregation (reference AverageCounter)
        assert res["summary"]["per_class"]
        for v in res["summary"]["per_class"].values():
            assert 0.0 <= v["deletion_auc"] <= 1.0 and v["n"] >= 1

    def test_use_mesh_matches_single_device(self, tmp_path):
        """--use-mesh fans the SBSM mask axis + ins/del pair axis over the
        8-device CPU mesh and shards the gallery; the AUCs must match the
        meshless run (fp-tolerant: psum reassociates the mask sum)."""
        from xmir_tpu.cli import evaluate_saliency

        outs = {}
        for name, extra in (("single", []), ("mesh", ["--use-mesh"])):
            out = str(tmp_path / f"{name}.json")
            evaluate_saliency.main([
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--explainer", "sbsm",
                "--window-size", "24", "--stride", "16",
                "--top-k", "2", "--limit", "2", "--step", "2000",
                "--save-every", "1", "--output", out,
            ] + extra)
            outs[name] = json.load(open(out))
        for r0, r1 in zip(outs["single"]["results"], outs["mesh"]["results"]):
            assert r1["retrieved"] == r0["retrieved"]
            assert r1["deletion_auc"] == pytest.approx(
                r0["deletion_auc"], abs=1e-4
            )
            assert r1["insertion_auc"] == pytest.approx(
                r0["insertion_auc"], abs=1e-4
            )


class TestComputeSaliencyMeshCLI:
    def test_self_saliency_use_mesh_matches(self, tmp_path):
        """compute_saliency --use-mesh: SBSM self-saliency maps produced with
        the mask axis sharded over the 8-device CPU mesh match the
        single-device maps (reference README.md:76 DataParallel fan-out)."""
        import numpy as np

        from xmir_tpu.cli import compute_saliency

        dirs = {}
        for name, extra in (("single", []), ("mesh", ["--use-mesh"])):
            d = tmp_path / name
            compute_saliency.main([
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--explainer", "sbsm",
                "--window-size", "24", "--stride", "16",
                "--eval-batch-size", "4", "--limit", "4",
                "--save-dir", str(d),
            ] + extra)
            dirs[name] = d
        singles = sorted(dirs["single"].glob("sal_*.npy"))
        assert len(singles) >= 4
        for f in singles:
            a = np.load(f)
            b = np.load(dirs["mesh"] / f.name)
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


class TestBiomedCLIPZeroShot:
    def test_zeroshot_smoke(self, tmp_path):
        """Reference test.py:237-347 path: prompt classification + cosine
        retrieval on a random-init small BiomedCLIP tower."""
        from xmir_tpu.cli import test as test_cli

        m = test_cli.main([
            "--dataset", "synthetic", "--model", "biomedclip",
            "--clip-depth", "2", "--clip-dim", "32",
            "--clip-image-size", "32", "--eval-batch-size", "16",
            "--save-dir", str(tmp_path),
        ])
        assert "zero_shot_accuracy" in m and "mAP" in m
        data = np.load(tmp_path / "biomedclip_zeroshot.npz", allow_pickle=True)
        assert data["embeds"].shape[1] == 512
        assert len(data["predictions"]) == 32
        assert list(data["class_names"]) == ["class 0", "class 1", "class 2"]


class TestChestmirIngestRawDetector:
    def test_ingest_with_raw_plugin_then_two_stage(self, tmp_path):
        """Full ChestMIR chain from a raw-output detector plugin: ingest
        (global + detected-region embeddings) -> two-stage eval."""
        import sys

        sys.path.insert(0, "/root/repo")
        try:
            from xmir_tpu.cli import chestmir_eval, chestmir_ingest

            gal = str(tmp_path / "cm.npz")
            chestmir_ingest.main([
                "--dataset", "synthetic", "--model", "tiny",
                "--embedding-dim", "16", "--split", "train",
                "--detector-plugin", "examples.detector_plugin_example",
                "--raw-detector-outputs", "--tta", "0,4",
                "--batch-size", "16", "--output", gal,
            ])
            data = np.load(gal, allow_pickle=True)
            regions = json.loads(str(data["regions"])) if "regions" in data else None
            out = str(tmp_path / "res.json")
            chestmir_eval.main([
                "--gallery", gal, "--target-lesions", "lung opacity",
                "--output", out,
            ])
            res = json.load(open(out))
            assert "stage1_global" in res
        finally:
            sys.path.remove("/root/repo")


class TestObjectStore:
    """Gallery-original upload (reference ingest_embeddings.py:319-383):
    local backend end-to-end; S3 backend gated on boto3/credentials."""

    def test_local_store_upload_and_uris(self, tmp_path):
        from xmir_tpu.utils.objectstore import (
            LocalDirStore,
            resolve_store,
            upload_originals,
        )

        srcs = []
        for i in range(3):
            p = tmp_path / f"img_{i}.png"
            p.write_bytes(b"fake-image-bytes-%d" % i)
            srcs.append(str(p))
        store = resolve_store(str(tmp_path / "bucket"))
        assert isinstance(store, LocalDirStore)
        uris = upload_originals(srcs, store, prefix="original")
        assert len(uris) == 3
        for src, uri in zip(srcs, uris):
            assert uri.endswith(f"original/{src.rsplit('/', 1)[1]}")
            assert open(uri, "rb").read() == open(src, "rb").read()

    def test_same_basename_across_subdirs_does_not_collide(self, tmp_path):
        # NIH-style layout: images_001/x.png and images_002/x.png must map
        # to distinct keys (relative to the common root), not silently
        # overwrite each other under key 'original/x.png'
        from xmir_tpu.utils.objectstore import LocalDirStore, upload_originals

        srcs = []
        for sub in ("images_001", "images_002"):
            d = tmp_path / sub
            d.mkdir()
            p = d / "x.png"
            p.write_bytes(f"bytes-from-{sub}".encode())
            srcs.append(str(p))
        store = LocalDirStore(str(tmp_path / "bucket"))
        uris = upload_originals(srcs, store, prefix="original")
        assert len(set(uris)) == 2
        for src, uri in zip(srcs, uris):
            assert open(uri, "rb").read() == open(src, "rb").read()

    def test_s3_store_gated(self, monkeypatch):
        from xmir_tpu.utils import objectstore

        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        with pytest.raises((ImportError, ValueError)):
            objectstore.S3Store("bucket")

    def test_ingest_records_uploaded_paths(self, tmp_path):
        from xmir_tpu.cli import ingest as ingest_cli
        from xmir_tpu.data import write_synthetic_covidx
        from xmir_tpu.index import ShardedGalleryIndex

        img_dir, manifest = write_synthetic_covidx(str(tmp_path), n=8, size=32)
        out = str(tmp_path / "gal.npz")
        dest = str(tmp_path / "store")
        ingest_cli.main([
            "--dataset", "covid", "--dataset-dir", img_dir,
            "--train-image-list", manifest,
            "--model", "tiny", "--embedding-dim", "16",
            "--split", "train", "--batch-size", "8",
            "--output", out, "--upload-originals", dest,
        ])
        idx = ShardedGalleryIndex.load(out)
        assert all(p.startswith(dest) for p in idx.paths)
        assert all(os.path.exists(p) for p in idx.paths)
