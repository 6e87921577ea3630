"""Parity-harness tests: the committed golden artifact must replay
bit-for-bit through the metric stack (cli/parity.py), and tampered metrics
must be caught."""
import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "parity_golden.npz")


class TestParityCLI:
    def test_golden_fixture_passes(self, tmp_path):
        from xmir_tpu.cli import parity

        out = str(tmp_path / "cmp.json")
        res = parity.main(["--results", FIXTURE, "--output", out])
        assert res["mismatches"] == []
        saved = json.load(open(out))
        assert saved["computed"]["mAP"] == pytest.approx(96.63841807909607)

    def test_stored_dists_path(self):
        from xmir_tpu.cli import parity

        res = parity.main(["--results", FIXTURE, "--use-stored-dists"])
        assert res["mismatches"] == []

    def test_tampered_metrics_fail(self, tmp_path):
        from xmir_tpu.cli import parity

        data = dict(np.load(FIXTURE, allow_pickle=True))
        stored = json.loads(str(data["metrics"]))
        stored["mAP"] += 1.0
        data["metrics"] = json.dumps(stored)
        bad = tmp_path / "bad.npz"
        np.savez(bad, **data)
        with pytest.raises(SystemExit):
            parity.main(["--results", str(bad)])

    def test_artifact_from_eval_cli_round_trips(self, tmp_path):
        """cli/test.py artifact -> cli/parity.py must agree with itself."""
        from xmir_tpu.cli import parity
        from xmir_tpu.cli import test as test_cli

        test_cli.main([
            "--dataset", "synthetic", "--model", "tiny",
            "--embedding-dim", "16", "--eval-batch-size", "16",
            "--save-dir", str(tmp_path),
        ])
        res = parity.main(
            ["--results", str(tmp_path / "evaluation_results.npz")]
        )
        assert res["mismatches"] == []
