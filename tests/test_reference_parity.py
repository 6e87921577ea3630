"""Replay REFERENCE-COMPUTED goldens through the xmir_tpu stack.

Every stored number in tests/fixtures/reference_*_golden.* was produced by
executing the reference repository's own torch code on synthetic fixtures
(see make_reference_goldens.py) — these tests prove quality parity against
the reference stack itself, not self-consistency:

  reference test.py evaluate()            -> cli/parity.py + single_label_metrics
  reference evaluate_multilabels          -> multilabel_metrics
  reference train.py in-training eval     -> metrics.train_eval_{single,multi}
  reference loss.py / ath_model.py        -> losses.*
  reference evaluation.py CausalMetric    -> xai.causal.run_causal_metric
"""
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"missing committed fixture {name}")
    return path


def _synthetic_single_label():
    rng = np.random.default_rng(12345)
    centers = rng.standard_normal((3, 32)).astype(np.float32) * 2.5
    labels = np.arange(60) % 3
    embeds = centers[labels] + rng.standard_normal((60, 32)).astype(np.float32) * 0.8
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    return embeds, labels.astype(np.int64)


def _synthetic_multilabel(n=48, c=14, seed=777):
    rng = np.random.default_rng(seed)
    labels = (rng.random((n, c)) < 0.18).astype(np.float32)
    labels[np.arange(n), rng.integers(0, c, n)] = 1.0
    proto = rng.standard_normal((c, 32)).astype(np.float32)
    embeds = labels @ proto + rng.standard_normal((n, 32)).astype(np.float32) * 0.6
    return embeds.astype(np.float32), labels


class TestEvalParity:
    def test_single_label_via_parity_cli(self, tmp_path):
        """cli/parity.py replays the reference-computed evaluate() artifact:
        R@K, mAP, mP@K, and all 35 majority-vote classification numbers."""
        from xmir_tpu.cli import parity

        out = tmp_path / "parity.json"
        result = parity.main(
            ["--results", _fixture("reference_single_label_golden.npz"),
             "--output", str(out)]
        )
        assert result["mismatches"] == []
        assert not result["multilabel"]

    def test_single_label_from_stored_reference_dists(self):
        """Same comparison but from the distance matrix the reference itself
        computed (-torch.cdist), bypassing our pairwise_neg_l2."""
        from xmir_tpu.cli import parity

        result = parity.main(
            ["--results", _fixture("reference_single_label_golden.npz"),
             "--use-stored-dists"]
        )
        assert result["mismatches"] == []

    def test_single_label_golden_matches_committed_self_pin(self):
        """The reference golden and the round-1 self-pinned golden share one
        embedding set — the stored metric dicts must agree, proving the
        self-pin was already at reference parity."""
        ref = np.load(_fixture("reference_single_label_golden.npz"),
                      allow_pickle=True)
        pin = np.load(_fixture("parity_golden.npz"), allow_pickle=True)
        ref_m = json.loads(str(ref["metrics"]))
        pin_m = json.loads(str(pin["metrics"]))
        np.testing.assert_allclose(ref_m["mAP"], pin_m["mAP"], rtol=1e-9)
        for k in ("R@1", "R@5", "R@10", "mP@1", "mP@5", "mP@10"):
            np.testing.assert_allclose(ref_m[k], pin_m[k], rtol=1e-6)

    def test_multilabel_metrics(self):
        """Jaccard-threshold mAP at full precision; P@K/R@K against the
        reference's printed table (2 decimals -> atol 0.005)."""
        from xmir_tpu.cli.test import multilabel_metrics
        from xmir_tpu.metrics import fill_diagonal_neg_inf, pairwise_cosine

        data = np.load(_fixture("reference_multilabel_golden.npz"),
                       allow_pickle=True)
        stored = json.loads(str(data["metrics"]))
        sims = np.asarray(
            fill_diagonal_neg_inf(pairwise_cosine(jnp.asarray(data["embeds"])))
        )
        computed = multilabel_metrics(sims, np.asarray(data["labels"]))
        for t in (0.25, 0.5):
            key = f"mAP@jaccard>{t}"
            np.testing.assert_allclose(computed[key], stored[key], rtol=1e-6)
        for k in (1, 5, 10, 15, 20):
            np.testing.assert_allclose(
                computed[f"P@{k}"], stored[f"P@{k}"], atol=5.1e-3
            )
            np.testing.assert_allclose(
                computed[f"R@{k}"], stored[f"R@{k}"], atol=5.1e-3
            )


class TestTrainEvalParity:
    def test_single_and_multilabel(self):
        from xmir_tpu.metrics.retrieval import (
            train_eval_multilabel,
            train_eval_single_label,
        )

        with open(_fixture("reference_train_eval_golden.json")) as f:
            golden = json.load(f)

        emb_s, lab_s = _synthetic_single_label()
        got = train_eval_single_label(emb_s, lab_s)
        for k, v in golden["single"].items():
            np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)

        emb_m, lab_m = _synthetic_multilabel()
        got = train_eval_multilabel(emb_m, lab_m)
        for k, v in golden["multilabel"].items():
            np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)


class TestLossParity:
    """Every loss vs the value the reference's loss.py computed on the same
    inputs (generator: make_reference_goldens.py golden_losses)."""

    @pytest.fixture(scope="class")
    def golden(self):
        with open(_fixture("reference_losses_golden.json")) as f:
            return json.load(f)

    @pytest.fixture(scope="class")
    def inputs(self):
        emb_s, lab_s = _synthetic_single_label()
        emb_s, lab_s = emb_s[:24] * 3.0, lab_s[:24]
        emb_m, lab_m = _synthetic_multilabel(n=24)
        rng = np.random.default_rng(99)
        logits = rng.standard_normal((24, 14)).astype(np.float32)
        d, widths = 16, [3, 0, 2, 5, 1, 4]
        img_f = rng.standard_normal((6, d)).astype(np.float32)
        txt_f = rng.standard_normal((6, d)).astype(np.float32)
        tok_f = rng.standard_normal((6, 49, d)).astype(np.float32)
        w_max = max(widths)
        concepts = np.zeros((6, w_max, d), np.float32)
        cmask = np.zeros((6, w_max), bool)
        for i, w in enumerate(widths):
            if w:
                concepts[i, :w] = rng.standard_normal((w, d)).astype(np.float32)
                cmask[i, :w] = True
        hashes = [rng.standard_normal((8, 48)).astype(np.float32)
                  for _ in range(3)]
        return dict(
            emb_s=jnp.asarray(emb_s), lab_s=jnp.asarray(lab_s),
            emb_m=jnp.asarray(emb_m), lab_m=jnp.asarray(lab_m),
            logits=jnp.asarray(logits), img_f=jnp.asarray(img_f),
            txt_f=jnp.asarray(txt_f), tok_f=jnp.asarray(tok_f),
            concepts=jnp.asarray(concepts), cmask=jnp.asarray(cmask),
            scale=jnp.asarray(2.302585), bias=jnp.asarray(-0.5),
            hashes=[jnp.asarray(h) for h in hashes],
        )

    def _close(self, got, want, rtol=2e-5):
        np.testing.assert_allclose(float(got), want, rtol=rtol, atol=1e-6)

    def test_triplet(self, golden, inputs):
        from xmir_tpu.losses import triplet_margin_loss

        for mining in ("batch_all", "batch_hard"):
            loss, aux = triplet_margin_loss(
                inputs["emb_s"], inputs["lab_s"], margin=1.0, mining=mining
            )
            self._close(loss, golden["values"][f"triplet_{mining}"])
            if mining == "batch_all":
                self._close(aux, golden["values"]["triplet_batch_all_aux"])

    def test_supcon(self, golden, inputs):
        from xmir_tpu.losses import supcon_loss

        self._close(supcon_loss(inputs["emb_s"], inputs["lab_s"]),
                    golden["values"]["supcon_single"])
        self._close(supcon_loss(inputs["emb_m"], inputs["lab_m"]),
                    golden["values"]["supcon_multilabel"])

    def test_multilabel_losses(self, golden, inputs):
        from xmir_tpu.losses import (
            asymmetric_loss,
            dual_branch_multilabel_loss,
            jaccard_supcon_loss,
            multilabel_contrastive_loss,
            weighted_multilabel_triplet_loss,
        )

        loss, _ = weighted_multilabel_triplet_loss(
            inputs["emb_m"], inputs["lab_m"], margin=0.3
        )
        self._close(loss, golden["values"]["weighted_multilabel_triplet"])
        self._close(jaccard_supcon_loss(inputs["emb_m"], inputs["lab_m"]),
                    golden["values"]["jaccard_supcon"])
        self._close(asymmetric_loss(inputs["logits"], inputs["lab_m"]),
                    golden["values"]["asymmetric"])
        self._close(
            multilabel_contrastive_loss(inputs["emb_m"], inputs["lab_m"]),
            golden["values"]["multilabel_contrastive"],
        )
        total, _ = dual_branch_multilabel_loss(
            {"embedding": inputs["emb_m"], "logits": inputs["logits"]},
            inputs["lab_m"],
        )
        self._close(total, golden["values"]["dual_branch"])

    def test_align_losses(self, golden, inputs):
        from xmir_tpu.losses import conceptclip_loss, it_align_loss, rc_align_loss

        self._close(
            it_align_loss(inputs["img_f"], inputs["txt_f"], inputs["scale"],
                          inputs["bias"]),
            golden["values"]["it_align"],
        )
        self._close(
            rc_align_loss(inputs["tok_f"], inputs["concepts"], inputs["cmask"],
                          inputs["scale"], inputs["bias"]),
            golden["values"]["rc_align"],
        )
        total, it, rc = conceptclip_loss(
            inputs["img_f"], inputs["txt_f"], inputs["tok_f"],
            inputs["concepts"], inputs["cmask"], inputs["scale"],
            inputs["bias"],
        )
        self._close(total, golden["values"]["conceptclip_total"])
        self._close(it, golden["values"]["conceptclip_it"])
        self._close(rc, golden["values"]["conceptclip_rc"])

    def test_triplet_hash(self, golden, inputs):
        from xmir_tpu.losses import triplet_hash_loss

        a, p, n = inputs["hashes"]
        self._close(triplet_hash_loss(a, p, n, margin=0.5),
                    golden["values"]["triplet_hash"])


class TestInsDelParity:
    def test_causal_metric_matches_reference(self):
        """run_causal_metric vs the reference CausalMetric.single_run AUC and
        zero-clip count on a fixed linear embedder (reference flattens
        channel-first: transpose before the matmul)."""
        from xmir_tpu.xai.causal import (
            blur_substrate,
            run_causal_metric,
            zeros_substrate,
        )

        with open(_fixture("reference_insdel_golden.json")) as f:
            golden = json.load(f)
        size = golden["inputs"]["size"]
        step = golden["inputs"]["step"]

        rng = np.random.default_rng(golden["inputs"]["seed"])
        w = rng.standard_normal((8, 3 * size * size)).astype(np.float32) * 0.1
        query = rng.standard_normal((1, 3, size, size)).astype(np.float32)
        retrieved = 0.8 * query + 0.35 * rng.standard_normal(
            (1, 3, size, size)
        ).astype(np.float32)
        saliency = rng.random((1, size, size)).astype(np.float32)

        w_j = jnp.asarray(w)

        def embed_fn(variables, imgs):
            flat = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(imgs.shape[0], -1)
            return flat @ w_j.T

        q = jnp.asarray(np.transpose(query[0], (1, 2, 0)))
        r = jnp.asarray(np.transpose(retrieved[0], (1, 2, 0)))

        for mode, substrate in (
            ("del", zeros_substrate),
            ("ins", blur_substrate(golden["inputs"]["klen"],
                                   golden["inputs"]["nsig"])),
        ):
            auc_val, zeros, _ = run_causal_metric(
                embed_fn, None, q, r, saliency[0], mode, substrate, step=step
            )
            np.testing.assert_allclose(
                auc_val, golden["results"][mode]["auc"], rtol=1e-5,
                err_msg=mode,
            )
            assert zeros == golden["results"][mode]["zero_clips"], mode
