"""Parity harness: replay a reference-produced evaluation artifact through
xmir_tpu's metric stack and check the numbers agree.

The reference's test.py saves `evaluation_results.npz` with
embeds/labels/dists/metrics (test.py:1122-1126); xmir_tpu's cli/test.py
writes the same format. This CLI recomputes every metric from the stored
embeddings (or the stored distance matrix) through the exact code path the
eval CLI uses and compares against the stored `metrics` JSON — so a single
artifact produced on the reference stack (real dataset + real weights)
proves quality parity here without the dataset or checkpoints on disk.

A committed golden fixture (tests/fixtures/parity_golden.npz) pins the full
metric suite against regressions.

Converted-CheXNet workflow (real-data parity on COVIDx):
  1. reference host:  python test.py --dataset covid --resume model.pt ...
     -> evaluation_results.npz
  2. this host:       python -m xmir_tpu.cli.parity --results evaluation_results.npz
     -> recomputes R@K / mAP / mP@K / majority-vote from the same embeds
        and reports PASS/FAIL per metric.
"""
from __future__ import annotations

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif isinstance(v, (int, float, np.floating, np.integer)):
            out[key] = float(v)
    return out


def compare_metrics(computed: dict, stored: dict, rtol: float = 1e-5,
                    atol: float = 1e-6):
    """Flat numeric comparison. Returns (rows, mismatches)."""
    flat_c, flat_s = _flatten(computed), _flatten(stored)
    rows, mismatches = [], []
    for key in sorted(flat_s):
        if key not in flat_c:
            rows.append((key, None, flat_s[key], "MISSING"))
            mismatches.append(key)
            continue
        c, s = flat_c[key], flat_s[key]
        ok = abs(c - s) <= atol + rtol * abs(s)
        rows.append((key, c, s, "ok" if ok else "FAIL"))
        if not ok:
            mismatches.append(key)
    return rows, mismatches


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu metric parity harness")
    p.add_argument("--results", required=True,
                   help=".npz with embeds/labels[/dists][/metrics]")
    p.add_argument("--multilabel", action="store_true",
                   help="Force multilabel path (default: labels.ndim > 1)")
    p.add_argument("--use-stored-dists", action="store_true",
                   help="Evaluate from the stored dists matrix instead of "
                        "recomputing it from embeds")
    p.add_argument("--rtol", default=1e-5, type=float)
    p.add_argument("--output", default="", help="Write comparison JSON")
    args = p.parse_args(argv)

    from ..metrics import fill_diagonal_neg_inf, pairwise_cosine, pairwise_neg_l2
    from .test import multilabel_metrics, single_label_metrics

    data = np.load(args.results, allow_pickle=True)
    labels = np.asarray(data["labels"])
    multilabel = args.multilabel or labels.ndim > 1

    if args.use_stored_dists and "dists" in data:
        dists = np.asarray(data["dists"])
    else:
        embeds = jnp.asarray(np.asarray(data["embeds"], np.float32))
        sim = pairwise_cosine(embeds) if multilabel else pairwise_neg_l2(embeds)
        dists = np.asarray(fill_diagonal_neg_inf(sim))

    computed = (
        multilabel_metrics(dists, labels)
        if multilabel
        else single_label_metrics(dists, labels)
    )

    result = {"computed": computed, "n": int(labels.shape[0]),
              "multilabel": multilabel}
    status = 0
    if "metrics" in data:
        stored = json.loads(str(data["metrics"]))
        rows, mismatches = compare_metrics(
            computed, stored, rtol=args.rtol
        )
        width = max(len(r[0]) for r in rows)
        for key, c, s, ok in rows:
            cs = "-" if c is None else f"{c:12.6f}"
            print(f"{key:<{width}}  computed {cs}  stored {s:12.6f}  [{ok}]")
        if mismatches:
            print(f">> PARITY FAIL: {len(mismatches)} metric(s) disagree: "
                  f"{mismatches}")
            status = 1
        else:
            print(f">> PARITY OK: all {len(rows)} metrics agree "
                  f"(rtol={args.rtol})")
        result["mismatches"] = mismatches
    else:
        print(">> no stored metrics in artifact; computed values:")
        for k, v in _flatten(computed).items():
            print(f"  {k}: {v:.6f}")

    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2, default=float)
    if status:
        sys.exit(status)
    return result


if __name__ == "__main__":
    main()
