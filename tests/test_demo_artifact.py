"""Replay of the committed chip-run learning-dynamics artifact.

tests/fixtures/demo_chip_run/ holds the output of
`python examples/demo_end_to_end.py --epochs 4` executed on a real TPU v5e
chip (CI-of-record): the synthetic-data train -> ckpt -> test -> ingest ->
query -> saliency -> ins/del pipeline through the public CLIs. The
synthetic goldens elsewhere prove numerical parity; this artifact proves
the SYSTEM trains — val mAP improves across epochs through the real train
CLI (reference train.py:1167-1248 epoch-loop behavior).
"""
import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "fixtures", "demo_chip_run")


@pytest.fixture(scope="module")
def summary():
    path = os.path.join(ART, "summary.json")
    if not os.path.exists(path):
        pytest.skip("demo chip artifact not committed")
    return json.load(open(path))


@pytest.fixture(scope="module")
def metrics():
    return [
        json.loads(line)
        for line in open(os.path.join(ART, "metrics.jsonl"))
    ]


class TestDemoChipArtifact:
    def test_ran_on_tpu(self, summary):
        assert summary["platform"] == "tpu"

    def test_val_map_improves(self, summary):
        maps = summary["eval_mAP_by_epoch"]
        assert len(maps) >= 3
        # the system learns: best epoch beats the first, and the curve is
        # not flat (synthetic clusters are separable, so the margin is real)
        assert max(maps) > maps[0] + 1.0, maps
        assert maps[-1] > maps[0], maps

    def test_train_losses_finite_and_decreasing(self, metrics):
        losses = [m["loss"] for m in metrics if m.get("kind") == "train"]
        assert losses and all(np.isfinite(losses))
        n = len(losses)
        first, last = np.median(losses[: n // 3]), np.median(losses[-n // 3:])
        assert last < first, (first, last)

    def test_sharded_deployment_path_taken(self, summary):
        """The r5 chip artifact runs the saliency/ins-del stage with
        --use-mesh: the gallery index served through the sharded
        (shard_map + merge) path and the XAI fan-out ran on a mesh
        (VERDICT r4 #8)."""
        if "use_mesh" not in summary:
            pytest.skip("pre-r5 artifact without the mesh leg")
        assert summary["use_mesh"] is True
        ins = summary["insdel"]["summary"]
        assert ins["use_mesh"] is True
        assert ins["mesh_devices"] >= 1
        assert ins["index"]["sharding"]["devices"] >= 1
        assert ins["index"]["index_type"] == "FLAT_EXACT"

    def test_eval_records_match_summary(self, metrics, summary):
        evals = [m for m in metrics if m.get("kind") == "eval"]
        assert [e["mAP"] for e in evals] == summary["eval_mAP_by_epoch"]
        for e in evals:
            for k in ("mAP", "R@1", "R@5", "R@10"):
                assert 0.0 <= e[k] <= 100.0

    def test_retrieval_beats_chance(self, summary):
        # 3 synthetic classes -> chance ~33%; the trained embedder's top-1
        # label accuracy through ingest+query must clear it decisively
        assert summary["n_queries"] >= 8
        assert summary["top1_label_accuracy_pct"] >= 60.0

    def test_insdel_aucs_valid(self, summary):
        flat = json.dumps(summary["insdel"])
        assert "del" in flat and "ins" in flat

        def walk(o):
            if isinstance(o, dict):
                for k, v in o.items():
                    if k.endswith("auc") or k == "auc":
                        assert 0.0 <= v <= 1.0, (k, v)
                    else:
                        walk(v)
            elif isinstance(o, list):
                for v in o:
                    walk(v)

        walk(summary["insdel"])
