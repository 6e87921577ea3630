"""Anomaly/OOD evaluation CLI (reference anomaly/test_anomaly.py): embed the
anomaly-free training split + the full test split, score test items by
distance to in-distribution class centroids, report AUROC/AUPR/FPR@95."""
from __future__ import annotations

import argparse
import os

import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, jitted_embed


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu anomaly detection eval")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--eval-batch-size", default=64, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--anomaly-class", default=2, type=int,
                   help="Held-out class id (COVID-19=2, melanoma=2)")
    p.add_argument("--save-dir", default="")
    args = p.parse_args(argv)

    from ..analysis import evaluate_anomaly
    from ..data.pipeline import embed_dataset

    args.anomaly = True  # train split excludes the anomaly class
    train_ds = build_dataset(args, "train")
    args.anomaly = False
    test_ds = build_dataset(args, "test")
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)

    tr_e, tr_l = embed_dataset(train_ds, embed, variables, spec,
                               batch_size=args.eval_batch_size,
                               num_workers=args.workers)
    te_e, te_l = embed_dataset(test_ds, embed, variables, spec,
                               batch_size=args.eval_batch_size,
                               num_workers=args.workers)
    res = evaluate_anomaly(tr_e, tr_l, te_e, te_l, anomaly_class=args.anomaly_class)
    print(f"FPR95:\t{100 * res['fpr@95']:.2f}")
    print(f"AUROC:\t{100 * res['auroc']:.2f}")
    print(f"AUPR:\t{100 * res['aupr']:.2f}")
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        np.savez(
            os.path.join(args.save_dir, "anomaly_results.npz"),
            auroc=res["auroc"], aupr=res["aupr"], fpr=res["fpr@95"],
            scores=res["scores"], labels=te_l,
        )
        print(f">> saved to {args.save_dir}/anomaly_results.npz")
    return res


if __name__ == "__main__":
    main()
