"""Query CLI — replaces the reference's Milvus query scripts
(milvus/milvus_retrieval.py, query_nih_zilliz.py): load a gallery index
artifact, embed queries, exact top-k (or full ranking with --top-k 0,
matching query_nih_zilliz.py:53), emit JSON results.
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from .common import (
    add_dataset_args,
    add_mesh_arg,
    add_model_args,
    add_precision_args,
    apply_score_precision,
    build_data_mesh,
    build_dataset,
    build_model,
    jitted_embed,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu gallery query")
    add_dataset_args(p)
    add_model_args(p)
    add_precision_args(p)
    p.add_argument("--index", required=True, help="Gallery .npz from xmir ingest")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--top-k", default=10, type=int,
                   help="0 = full-gallery ranking")
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--output", default="query_results.json")
    p.add_argument("--path-map", default="",
                   help="OLD=NEW gallery path prefix rewrite (reference "
                        "milvus/path_mapper.py, e.g. /kaggle/input=/data)")
    add_mesh_arg(p)
    args = p.parse_args(argv)
    apply_score_precision(args)

    from ..data.pipeline import embed_dataset
    from ..index import ShardedGalleryIndex

    mesh = build_data_mesh(args)
    idx = ShardedGalleryIndex.load(args.index, mesh=mesh)
    if args.path_map:
        old, _, new = args.path_map.partition("=")
        n = idx.remap_paths(old, new)
        print(f">> remapped {n} gallery paths ({old!r} -> {new!r})")
    print(f">> index: {idx.ntotal} vectors, dim={idx.dim}, metric={idx.metric}")

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)
    queries, q_labels = embed_dataset(
        dataset, embed, variables, spec,
        batch_size=args.batch_size, num_workers=args.workers, mesh=mesh,
    )

    k = args.top_k if args.top_k > 0 else idx.ntotal
    results = []
    hits_per_query = idx.search_with_metadata(queries, k=k)
    for qi, hits in enumerate(hits_per_query):
        results.append(
            {
                "query_path": str(dataset.image_names[qi]),
                "query_label": np.asarray(dataset.labels[qi]).tolist(),
                "results": hits,
            }
        )
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f">> wrote {len(results)} query results to {args.output}")


if __name__ == "__main__":
    main()
