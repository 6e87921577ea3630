"""Tests for ensembling, late fusion, dual-model comparison, anomaly eval,
and hashing metrics."""
import json
import numpy as np
import pytest
import jax.numpy as jnp

from xmir_tpu.analysis import (
    EmbeddingSource,
    align_sources,
    binarize_codes,
    class_centroids,
    compare_retrievers,
    concat_fusion,
    confidence_fusion,
    ensemble_embeddings,
    evaluate_anomaly,
    export_comparison,
    hash_retrieval_metrics,
    render_mismatch_html,
    retrieval_metrics_from_scores,
    run_late_fusion_experiments,
    score_fusion,
    weighted_sum_fusion,
)
from xmir_tpu.index import ShardedGalleryIndex


def _clusters(rng, n=60, d=16, classes=3, spread=0.3):
    centers = rng.standard_normal((classes, d)) * 3
    labels = np.arange(n) % classes
    e = (centers[labels] + rng.standard_normal((n, d)) * spread).astype(np.float32)
    return e, labels


class TestEnsemble:
    def test_average_normalized(self, rng):
        a = rng.standard_normal((10, 8)).astype(np.float32)
        b = rng.standard_normal((10, 8)).astype(np.float32)
        out = np.asarray(ensemble_embeddings([a, b], "average"))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_concatenate_dims(self, rng):
        a = rng.standard_normal((10, 8)).astype(np.float32)
        b = rng.standard_normal((10, 4)).astype(np.float32)
        out = np.asarray(ensemble_embeddings([a, b], "concatenate"))
        assert out.shape == (10, 12)

    def test_weighted_equals_average(self, rng):
        a = rng.standard_normal((10, 8)).astype(np.float32)
        b = rng.standard_normal((10, 8)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ensemble_embeddings([a, b], "average")),
            np.asarray(ensemble_embeddings([a, b], "weighted")),
            atol=1e-5,
        )

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            ensemble_embeddings([np.zeros((2, 2))], "nope")


class TestFusion:
    def test_align_sources(self, rng):
        e = rng.standard_normal((6, 4)).astype(np.float32)
        a = EmbeddingSource([f"p{i}" for i in range(6)], np.arange(6), e)
        b = EmbeddingSource(
            [f"p{i}" for i in [4, 2, 0, 9]], np.array([4, 2, 0, 9]), e[:4]
        )
        aa, bb = align_sources(a, b)
        assert aa.image_paths == ["p0", "p2", "p4"]
        assert list(bb.labels) == [0, 2, 4]

    def test_weighted_sum_dim_mismatch(self, rng):
        out = weighted_sum_fusion(
            rng.standard_normal((4, 8)), rng.standard_normal((4, 16)), 0.5
        )
        assert out is None

    def test_fusion_improves_or_matches(self, rng):
        # two noisy views of the same clusters: fusing should not be worse
        e, labels = _clusters(rng)
        noise_a = e + rng.standard_normal(e.shape) * 0.5
        noise_b = e + rng.standard_normal(e.shape) * 0.5
        a = EmbeddingSource([f"p{i}" for i in range(len(e))], labels, noise_a)
        b = EmbeddingSource([f"p{i}" for i in range(len(e))], labels, noise_b)
        res = run_late_fusion_experiments(a, b, alphas=(0.5,))
        assert res["concat_fusion"]["mAP"] >= min(
            res["baseline_a"]["mAP"], res["baseline_b"]["mAP"]
        )
        assert "score_fusion_alpha_0.5" in res
        assert "confidence_fusion_top12_margin" in res

    def test_score_fusion_normalizations(self, rng):
        s = rng.standard_normal((5, 5))
        for mode in ("none", "zscore", "minmax"):
            out = score_fusion(s, s, 0.5, mode)
            assert out.shape == (5, 5)
        with pytest.raises(ValueError):
            score_fusion(s, s, 0.5, "bad")

    def test_confidence_fusion_picks_confident(self):
        # model a: confident correct for q0; model b: confident for q1
        sa = np.array([[0, 0.9, 0.1], [0, 0, 0.01], [0.1, 0.2, 0]])
        sb = np.array([[0, 0.5, 0.45], [0.9, 0, 0.1], [0.3, 0.1, 0]])
        fused = confidence_fusion(sa, sb)
        np.testing.assert_array_equal(fused[0], sa[0])
        np.testing.assert_array_equal(fused[1], sb[1])


class TestComparison:
    def test_groups_and_export(self, rng, tmp_path):
        e, labels = _clusters(rng, n=30)
        paths = [f"img{i}.png" for i in range(30)]
        good = ShardedGalleryIndex(16)
        good.add(e, labels, paths)
        good.build()
        bad = ShardedGalleryIndex(16)
        bad.add(rng.standard_normal(e.shape).astype(np.float32), labels, paths)
        bad.build()
        groups = compare_retrievers(e, labels, paths, good, bad, k=5)
        total = sum(len(v) for v in groups.values())
        assert total == 30
        # the good index should win most disagreements
        assert len(groups["model_a_correct_model_b_wrong"]) >= len(
            groups["model_b_correct_model_a_wrong"]
        )
        out = export_comparison(groups, str(tmp_path))
        assert (tmp_path / "comparison_results.csv").exists()
        html_path = render_mismatch_html(groups, str(tmp_path / "report.html"))
        content = (tmp_path / "report.html").read_text()
        assert "disagreement" in content


class TestAnomaly:
    def test_separable_anomaly(self, rng):
        # classes 0/1 in-distribution, class 2 far away
        centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 9.0, 0]])
        tr_labels = np.repeat([0, 1], 30)
        tr = centers[tr_labels] + rng.standard_normal((60, 4)) * 0.2
        te_labels = np.repeat([0, 1, 2], 20)
        te = centers[te_labels] + rng.standard_normal((60, 4)) * 0.2
        res = evaluate_anomaly(tr, tr_labels, te, te_labels, anomaly_class=2)
        assert res["auroc"] > 0.95
        assert res["n_anomaly"] == 20

    def test_centroids(self, rng):
        e = np.arange(12, dtype=np.float32).reshape(6, 2)
        labels = np.array([0, 0, 0, 1, 1, 1])
        c = class_centroids(e, labels, [0, 1])
        np.testing.assert_allclose(c[0], e[:3].mean(0))


class TestHashing:
    def test_hamming_metrics_perfect(self, rng):
        codes = np.where(rng.standard_normal((3, 16)) > 0, 1.0, -1.0)
        gallery = np.repeat(codes, 5, axis=0)
        g_labels = np.repeat([0, 1, 2], 5)
        res = hash_retrieval_metrics(
            codes, np.array([0, 1, 2]), gallery, g_labels, topk_values=(5,),
        )
        m = res["retrieval"][5]
        assert m["mhr"] == 1.0 and m["map"] == 1.0 and m["mrr"] == 1.0
        assert m["mp@k"] == 1.0 and m["majority_acc"] == 1.0

    def test_binarize(self):
        np.testing.assert_array_equal(
            binarize_codes(np.array([-0.5, 0.0, 2.0])), [0.0, 1.0, 1.0]
        )

    def test_classification_acc(self, rng):
        codes = rng.standard_normal((4, 8)).astype(np.float32)
        logits = np.eye(4)[..., :3] if False else np.eye(4)[:, :3]
        labels = np.array([0, 1, 2, 0])
        logits = np.zeros((4, 3))
        logits[np.arange(4), labels] = 1.0
        res = hash_retrieval_metrics(
            codes, labels, codes, labels, query_logits=logits, topk_values=(1,),
        )
        assert res["classification_acc"] == 1.0


class TestZeroShot:
    def test_classify_separable(self, rng):
        from xmir_tpu.analysis import zero_shot_classify

        txt = rng.standard_normal((3, 16)).astype(np.float32)
        labels = np.repeat([0, 1, 2], 5)
        img = txt[labels] + rng.standard_normal((15, 16)).astype(np.float32) * 0.05
        preds, probs = zero_shot_classify(img, txt, logit_scale=np.log(10.0))
        assert (preds == labels).mean() == 1.0
        assert probs.shape == (15, 3)
        assert ((probs >= 0) & (probs <= 1)).all()

    def test_concept_profiles_cluster(self, rng):
        from xmir_tpu.analysis import concept_profile_embeddings

        concepts = rng.standard_normal((4, 16)).astype(np.float32)
        labels = np.repeat([0, 1], 6)
        img = concepts[labels] + rng.standard_normal((12, 16)).astype(np.float32) * 0.05
        prof = concept_profile_embeddings(img, concepts, logit_scale=np.log(10.0))
        assert prof.shape == (12, 4)
        # same-class profiles more similar than cross-class
        same = np.linalg.norm(prof[0] - prof[1])
        cross = np.linalg.norm(prof[0] - prof[6])
        assert same < cross

    def test_text_rerank_promotes_class_match(self, rng):
        from xmir_tpu.analysis import text_rerank_scores

        # 4 images, labels [0,0,1,1]; image space is ambiguous but
        # text-similarity separates classes perfectly
        e = rng.standard_normal((4, 8)).astype(np.float64) * 0.01
        e[:, 0] = 1.0  # nearly identical image embeddings
        labels = np.array([0, 0, 1, 1])
        its = np.zeros((4, 2))
        its[np.arange(4), labels] = 1.0  # each image matches its class prompt
        scores = text_rerank_scores(e, labels, its, rerank_k=4, image_weight=0.1)
        # for query 0, the top item must now be image 1 (same class)
        order = np.argsort(-scores[0])
        assert order[0] == 1


class TestReports:
    def test_analyze_ins_del(self, tmp_path):
        from xmir_tpu.analysis import analyze_insertion_deletion

        payload = {"results": [
            {"query_label": 0, "deletion_auc": 0.4, "insertion_auc": 0.8},
            {"query_label": 0, "deletion_auc": 0.7, "insertion_auc": 0.6},
            {"query_label": 1, "deletion_auc": 0.5, "insertion_auc": 0.75},
        ]}
        p = tmp_path / "r.json"
        p.write_text(json.dumps(payload))
        s = analyze_insertion_deletion(str(p))
        assert s["n_queries"] == 3
        assert s["good_saliency_rate"] == pytest.approx(2 / 3)
        assert s["per_class"]["0"]["n"] == 2

    def test_overlay(self, rng):
        from xmir_tpu.analysis import overlay_saliency

        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        sal = rng.random((16, 16))
        out = overlay_saliency(img, sal)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
        assert not np.array_equal(out, img)
