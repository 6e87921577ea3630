"""Gallery ingestion CLI — replaces the reference's Milvus ingestion
(ingest_embeddings.py:1-599, ingest_nih_gallery_zilliz.py): embed the gallery
set and persist a ShardedGalleryIndex .npz artifact (embeddings + labels +
paths) instead of inserting into a remote vector DB.
"""
from __future__ import annotations

import argparse
import time

from .common import (
    add_dataset_args,
    add_mesh_arg,
    add_model_args,
    build_data_mesh,
    build_dataset,
    build_model,
    jitted_embed,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu gallery ingestion")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--metric", default="cosine",
                   choices=["cosine", "ip", "l2", "hamming"])
    p.add_argument("--output", default="gallery.npz",
                   help="Index artifact path (.npz)")
    p.add_argument("--skip-errors", action="store_true",
                   help="Skip unreadable images instead of failing "
                        "(reference ingest_embeddings.py:293-302)")
    p.add_argument("--upload-originals", default="",
                   help="Upload gallery originals and record the stored URIs "
                        "as the index paths (reference "
                        "ingest_embeddings.py:319-383): 's3://bucket' for S3 "
                        "(needs boto3 + AWS creds) or a directory for the "
                        "local/mounted-volume store. Default: record local "
                        "paths (the reference's --store_local_paths).")
    p.add_argument("--upload-prefix", default="original",
                   help="Key prefix inside the store "
                        "(S3_ORIGINAL_IMAGES_PREFIX)")
    add_mesh_arg(p)
    args = p.parse_args(argv)

    from ..data.pipeline import embed_dataset
    from ..index import ShardedGalleryIndex

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)

    mesh = build_data_mesh(args)
    t0 = time.time()
    embeds, labels = embed_dataset(
        dataset, embed, variables, spec,
        batch_size=args.batch_size, num_workers=args.workers,
        skip_errors=args.skip_errors, mesh=mesh,
    )
    dt = time.time() - t0
    print(f">> embedded {len(dataset)} images in {dt:.1f}s "
          f"({len(dataset) / dt:.1f} img/s)")

    paths = [str(n) for n in dataset.image_names]
    if args.upload_originals:
        from ..utils.objectstore import resolve_store, upload_originals

        store = resolve_store(args.upload_originals)
        paths = upload_originals(paths, store, args.upload_prefix)
        print(f">> uploaded {len(paths)} originals -> "
              f"{args.upload_originals} (sample: {paths[0]})")

    idx = ShardedGalleryIndex(embeds.shape[1], metric=args.metric)
    idx.add(embeds, labels, paths)
    idx.build()
    idx.save(args.output)
    print(f">> index saved: {args.output} ({idx.ntotal} vectors, "
          f"dim={embeds.shape[1]}, metric={args.metric})")


if __name__ == "__main__":
    main()
