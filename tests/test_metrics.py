"""Golden tests for retrieval/saliency/anomaly metrics against hand-computed
values and sklearn cross-checks."""
import numpy as np
import pytest
import jax.numpy as jnp
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

from xmir_tpu.metrics import (
    auc,
    compute_ap,
    compute_classification_metrics,
    compute_map,
    compute_map_multilabel,
    fill_diagonal_neg_inf,
    get_measures,
    jaccard_matrix,
    majority_vote,
    multilabel_precision_recall_at_k,
    pairwise_cosine,
    pairwise_neg_l2,
    retrieval_recall_at_k,
    train_eval_multilabel,
    train_eval_single_label,
)
from xmir_tpu.metrics.retrieval import _average_precision_score, _prf


def _rand_embeds(rng, n=24, d=16):
    return rng.standard_normal((n, d)).astype(np.float32)


class TestSimilarity:
    def test_pairwise_cosine_unit_diag(self, rng):
        e = _rand_embeds(rng)
        s = np.asarray(pairwise_cosine(jnp.asarray(e)))
        np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-5)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        np.testing.assert_allclose(s, en @ en.T, atol=1e-5)

    def test_pairwise_neg_l2_matches_cdist(self, rng):
        e = _rand_embeds(rng)
        s = np.asarray(pairwise_neg_l2(jnp.asarray(e)))
        ref = -np.sqrt(
            np.maximum(
                ((e[:, None, :] - e[None, :, :]) ** 2).sum(-1), 0.0
            )
        )
        np.testing.assert_allclose(s, ref, atol=2e-3)

    def test_fill_diagonal(self, rng):
        s = fill_diagonal_neg_inf(jnp.ones((4, 4)))
        assert np.all(np.isneginf(np.diag(np.asarray(s))))


class TestTrapezoidAP:
    def test_perfect_ranking(self):
        # positives at ranks 0,1,2 with nres=3 -> AP=1
        assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)

    def test_hand_computed(self):
        # single positive at rank 1 (0-based), nres=1:
        # j=0: precision_0 = 0/1 = 0, precision_1 = 1/2 -> ap = (0+0.5)/2 = 0.25
        assert compute_ap(np.array([1]), 1) == pytest.approx(0.25)

    def test_compute_map_self_included(self):
        # 4 items, labels [0,0,1,1]; sims = identity-ish ranking where each
        # query ranks its same-class partner first, self last (diag -inf).
        labels = np.array([0, 0, 1, 1])
        sims = np.array(
            [
                [-np.inf, 0.9, 0.1, 0.2],
                [0.9, -np.inf, 0.2, 0.1],
                [0.1, 0.2, -np.inf, 0.9],
                [0.2, 0.1, 0.9, -np.inf],
            ]
        )
        ranks = np.argsort(-sims, axis=1).T  # (db, nq) column-major convention
        mAP, aps, pr, prs = compute_map(ranks, labels, kappas=[1, 5])
        # each query: positives = {self, partner}; partner at rank0, self at rank3
        # ap = compute_ap([0, 3], 2) = (1 + 1)*.25 + (1/3 + 2/4)*.25 = 0.5+0.2083
        expected = compute_ap(np.array([0, 3]), 2)
        np.testing.assert_allclose(aps, expected)
        assert mAP == pytest.approx(expected)

    def test_recall_at_k(self):
        labels = np.array([0, 0, 1, 1])
        sims = np.array(
            [
                [-np.inf, 0.9, 0.1, 0.2],
                [0.9, -np.inf, 0.2, 0.1],
                [0.1, 0.2, -np.inf, 0.9],
                [0.2, 0.1, 0.9, -np.inf],
            ]
        )
        r1, r5 = retrieval_recall_at_k(sims, labels, topk=(1, 3))
        assert r1 == pytest.approx(100.0)
        assert r5 == pytest.approx(100.0)

    def test_recall_at_k_miss(self):
        labels = np.array([0, 1, 2, 3])  # no positives at all
        sims = np.random.default_rng(0).random((4, 4))
        np.fill_diagonal(sims, -np.inf)
        (r1,) = retrieval_recall_at_k(sims, labels, topk=(1,))
        assert r1 == 0.0


class TestMajorityVote:
    def test_vote(self):
        assert majority_vote([1, 1, 2]) == 1
        assert majority_vote([]) is None

    def test_prf_matches_sklearn(self, rng):
        y_true = rng.integers(0, 3, 50)
        y_pred = rng.integers(0, 3, 50)
        for avg in ["macro", "weighted"]:
            p, r, f = _prf(y_true, y_pred, avg)
            assert p == pytest.approx(
                precision_score(y_true, y_pred, average=avg, zero_division=0)
            )
            assert r == pytest.approx(
                recall_score(y_true, y_pred, average=avg, zero_division=0)
            )
            assert f == pytest.approx(
                f1_score(y_true, y_pred, average=avg, zero_division=0)
            )

    def test_classification_metrics_shape(self, rng):
        e = _rand_embeds(rng, n=12)
        labels = rng.integers(0, 3, 12)
        sims = np.asarray(fill_diagonal_neg_inf(pairwise_cosine(jnp.asarray(e))))
        res = compute_classification_metrics(labels, sims, k_values=(1, 5))
        assert set(res.keys()) == {1, 5}
        assert res[1]["accuracy"] <= 100.0
        # cross-check accuracy against sklearn on k=1 majority vote
        ranks = np.argsort(-sims, axis=0)
        preds = [labels[ranks[0, i]] for i in range(12)]
        assert res[1]["accuracy"] == pytest.approx(
            accuracy_score(labels, preds) * 100.0
        )


class TestMultiLabel:
    def test_jaccard_matrix(self):
        labels = np.array([[1, 1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        j = jaccard_matrix(labels)
        assert j[0, 1] == pytest.approx(0.5, abs=1e-6)
        assert j[0, 2] == pytest.approx(0.0, abs=1e-6)
        assert j[0, 0] == pytest.approx(1.0, abs=1e-6)

    def test_map_multilabel_perfect(self):
        labels = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], dtype=np.float32)
        e = np.array([[1, 0], [1, 0.01], [0, 1], [0.01, 1]], dtype=np.float32)
        sims = np.asarray(fill_diagonal_neg_inf(pairwise_cosine(jnp.asarray(e))))
        m = compute_map_multilabel(sims, labels, threshold=0.5)
        assert m == pytest.approx(1.0)

    def test_multilabel_pr_at_k(self):
        labels = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], dtype=np.float32)
        e = np.array([[1, 0], [1, 0.01], [0, 1], [0.01, 1]], dtype=np.float32)
        sims = np.asarray(fill_diagonal_neg_inf(pairwise_cosine(jnp.asarray(e))))
        res = multilabel_precision_recall_at_k(sims, labels, k_values=(1,))
        assert res[1]["precision"] == pytest.approx(100.0)
        assert res[1]["recall"] == pytest.approx(100.0)


class TestTrainEval:
    def test_single_label_perfect(self, rng):
        # two tight clusters -> mAP 100, R@1 100
        e = np.concatenate(
            [
                rng.standard_normal((5, 8)) * 0.01 + np.array([10.0] + [0] * 7),
                rng.standard_normal((5, 8)) * 0.01 + np.array([0, 10.0] + [0] * 6),
            ]
        ).astype(np.float32)
        labels = np.array([0] * 5 + [1] * 5)
        m = train_eval_single_label(e, labels)
        assert m["mAP"] == pytest.approx(100.0)
        assert m["R@1"] == pytest.approx(100.0)

    def test_ap_matches_sklearn(self, rng):
        y = rng.integers(0, 2, 30).astype(float)
        if y.sum() == 0:
            y[0] = 1.0
        s = rng.standard_normal(30)
        assert _average_precision_score(y, s) == pytest.approx(
            average_precision_score(y, s), abs=1e-9
        )

    def test_multilabel_eval_runs(self, rng):
        e = _rand_embeds(rng, n=16)
        labels = (rng.random((16, 5)) > 0.6).astype(np.float32)
        labels[labels.sum(1) == 0, 0] = 1.0
        m = train_eval_multilabel(e, labels)
        assert 0.0 <= m["mAP"] <= 100.0
        assert set(m) == {"mAP", "R@1", "R@5", "R@10"}


class TestSaliencyAUC:
    def test_trapezoid(self):
        # linear ramp 0..1 -> area 0.5
        arr = np.linspace(0, 1, 11)
        assert auc(arr) == pytest.approx(0.5)

    def test_constant(self):
        assert auc(np.ones(5)) == pytest.approx(1.0)


class TestAnomaly:
    def test_matches_sklearn(self, rng):
        pos = rng.standard_normal(100) + 1.5
        neg = rng.standard_normal(150)
        auroc, aupr, fpr = get_measures(pos, neg)
        scores = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(100), np.zeros(150)])
        assert auroc == pytest.approx(roc_auc_score(labels, scores), abs=1e-9)
        assert aupr == pytest.approx(average_precision_score(labels, scores), abs=1e-9)
        assert 0.0 <= fpr <= 1.0

    def test_perfect_separation(self):
        auroc, aupr, fpr = get_measures(np.array([2.0, 3.0]), np.array([0.0, 1.0]))
        assert auroc == pytest.approx(1.0)
        assert fpr == pytest.approx(0.0)
