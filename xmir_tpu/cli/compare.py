"""Dual-model retrieval comparison CLI (reference
retrieval_analysis/run_analysis.py): query two gallery indexes with the same
query set, classify agreement groups, export JSON/CSV + HTML mismatch report.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu dual-model comparison")
    p.add_argument("--index-a", required=True, help="Gallery .npz for model A")
    p.add_argument("--index-b", required=True, help="Gallery .npz for model B")
    p.add_argument("--queries-a", required=True,
                   help="npz with embeds/labels/paths for model A's queries")
    p.add_argument("--queries-b", default="",
                   help="Same queries embedded by model B (defaults to A's)")
    p.add_argument("--name-a", default="model_a")
    p.add_argument("--name-b", default="model_b")
    p.add_argument("--top-k", default=5, type=int)
    p.add_argument("--out-dir", default="./comparison")
    p.add_argument("--html", action="store_true")
    args = p.parse_args(argv)

    from ..analysis import compare_retrievers, export_comparison, render_mismatch_html
    from ..analysis.fusion import EmbeddingSource
    from ..index import ShardedGalleryIndex

    idx_a = ShardedGalleryIndex.load(args.index_a)
    idx_b = ShardedGalleryIndex.load(args.index_b)
    qa = EmbeddingSource.from_npz(args.queries_a)
    qb = EmbeddingSource.from_npz(args.queries_b) if args.queries_b else qa

    names = (args.name_a, args.name_b)
    hits_a = idx_a.search_with_metadata(qa.embeddings, k=args.top_k)
    hits_b = idx_b.search_with_metadata(qb.embeddings, k=args.top_k)

    # classify via the shared comparison core by faking per-model indexes
    from ..analysis.comparison import majority_correct

    groups = {
        "both_correct": [], "both_wrong": [],
        f"{names[0]}_correct_{names[1]}_wrong": [],
        f"{names[1]}_correct_{names[0]}_wrong": [],
    }
    for i, label in enumerate(qa.labels):
        true = label.item() if hasattr(label, "item") else label
        ca = majority_correct([h["label"] for h in hits_a[i]], true, args.top_k)
        cb = majority_correct([h["label"] for h in hits_b[i]], true, args.top_k)
        case = {
            "query_path": qa.image_paths[i], "query_label": true,
            names[0]: hits_a[i], names[1]: hits_b[i],
            f"{names[0]}_correct": ca, f"{names[1]}_correct": cb,
        }
        key = (
            "both_correct" if ca and cb else
            "both_wrong" if not ca and not cb else
            f"{names[0]}_correct_{names[1]}_wrong" if ca else
            f"{names[1]}_correct_{names[0]}_wrong"
        )
        groups[key].append(case)

    for g, cases in groups.items():
        print(f"{g:<45} {len(cases)}")
    export_comparison(groups, args.out_dir, names)
    if args.html:
        path = render_mismatch_html(
            groups, f"{args.out_dir}/mismatches.html", names
        )
        print(f">> HTML report: {path}")
    return groups


if __name__ == "__main__":
    main()
