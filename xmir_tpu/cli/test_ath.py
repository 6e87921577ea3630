"""ATH hashing retrieval evaluation CLI (reference test_ath.py): extract hash
codes for gallery + query splits, Hamming (or L2) retrieval, report
mHR/mAP/mRR/mP@K/R@K/majority accuracy per top-K + classification accuracy."""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, build_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu ATH retrieval eval")
    add_dataset_args(p)
    p.add_argument("--resume", required=True)
    p.add_argument("--hash-size", default=48, type=int)
    p.add_argument("--num-classes", default=3, type=int)
    p.add_argument("--image-size", default=256, type=int)
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--binary-codes", action="store_true")
    p.add_argument("--topk", type=int, nargs="+", default=[1, 5, 10])
    p.add_argument("--save-json", default="")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args(argv)

    from ..analysis import hash_retrieval_metrics
    from ..data.pipeline import batch_iterator
    from ..data.transforms import normalize
    from ..models import ATHEmbedder
    from ..utils import load_checkpoint, merge_params

    model = ATHEmbedder(args.hash_size, args.num_classes, args.image_size)
    x0 = jnp.zeros((2, args.image_size, args.image_size, 3))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0))
    loaded = load_checkpoint(args.resume)
    for coll in ("params", "batch_stats"):
        if coll in loaded:
            variables[coll], _, _ = merge_params(variables[coll], loaded[coll])

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def extract(ds):
        codes, logits, labels = [], [], []
        for imgs, labs, _ in batch_iterator(ds, args.batch_size,
                                            image_size=args.image_size):
            x = normalize(jnp.asarray(imgs), (0.485, 0.456, 0.406),
                          (0.229, 0.224, 0.225))
            out = fwd(variables, x)
            codes.append(np.asarray(out["hash_codes"]))
            logits.append(np.asarray(out["logits"]))
            labels.extend(np.asarray(labs).tolist())
        return np.concatenate(codes), np.concatenate(logits), np.asarray(labels)

    gallery = build_dataset(args, "train")
    query = build_dataset(args, "test")
    g_codes, _, g_labels = extract(gallery)
    q_codes, q_logits, q_labels = extract(query)
    res = hash_retrieval_metrics(
        q_codes, q_labels, g_codes, g_labels, q_logits,
        topk_values=tuple(args.topk), binary_codes=args.binary_codes,
    )
    print(f"classification acc: {res['classification_acc'] * 100:.2f}%")
    for k, m in res["retrieval"].items():
        print(f"top-{k}: mHR {m['mhr']:.4f}  mAP {m['map']:.4f}  "
              f"mRR {m['mrr']:.4f}  mP@K {m['mp@k']:.4f}  "
              f"majority {m['majority_acc']:.4f}")
    if args.save_json:
        with open(args.save_json, "w") as f:
            json.dump(res, f, indent=2)
    return res


if __name__ == "__main__":
    main()
