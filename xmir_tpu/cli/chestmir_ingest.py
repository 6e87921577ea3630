"""ChestMIR gallery ingestion CLI (reference ChestMIR/milvus_embed.py):
global embedding + per-lesion region embeddings for every gallery image,
written to the ChestMIR .npz artifact consumed by `xmir chestmir_eval`.

Detections come from a JSON file {image_name: [detection dicts]} (produced
offline by any detector; the reference's YOLO ONNX weights are not
retrainable here) or from a detector plugin module exposing
`build_detectors() -> [callable]` for the 5-fold x TTA WBF path.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, jitted_embed


def main(argv=None):
    p = argparse.ArgumentParser(description="ChestMIR two-stage gallery ingest")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--detections", default="",
                   help="JSON {image_basename: [det dicts with class_name/x1..y2]}")
    p.add_argument("--detector-plugin", default="",
                   help="Python module with build_detectors() for live detection")
    p.add_argument("--raw-detector-outputs", action="store_true",
                   help="detector fns return raw YOLO head tensors; decode "
                        "via chestmir.inference (conf gate, class-offset "
                        "NMS, coordinate unscaling)")
    p.add_argument("--tta", default="0,4",
                   help="comma-separated TTA variant ids in 0..7")
    p.add_argument("--batch-size", default=32, type=int)
    p.add_argument("--region-batch-size", default=16, type=int)
    p.add_argument("--score-thres", default=0.1, type=float)
    p.add_argument("--wbf-iou", default=0.25, type=float)
    p.add_argument("--output", default="chestmir_gallery.npz")
    args = p.parse_args(argv)

    from ..chestmir import detections_with_tta_folds, embed_regions
    from ..data.pipeline import embed_dataset
    from .chestmir_eval import save_chestmir_npz

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)

    print(f">> global embeddings for {len(dataset)} images ...")
    globals_, labels = embed_dataset(
        dataset, embed, variables, spec, batch_size=args.batch_size
    )

    det_table = {}
    detector_fns = None
    if args.detections:
        det_table = json.load(open(args.detections))
    elif args.detector_plugin:
        import importlib

        detector_fns = importlib.import_module(args.detector_plugin).build_detectors()
    else:
        print(">> no detections source: artifact will carry empty region maps "
              "(stage 2 falls back to global ranking)")

    regions_per_image = []
    for i in range(len(dataset)):
        base = os.path.basename(str(dataset.image_names[i]))
        if detector_fns is not None:
            img = dataset.load_image(i)
            dets = detections_with_tta_folds(
                img, detector_fns, wbf_iou=args.wbf_iou,
                raw_outputs=args.raw_detector_outputs,
                tta=tuple(int(t) for t in args.tta.split(",")),
                score_thres=args.score_thres,
            )
        else:
            dets = det_table.get(base, [])
        if dets:
            img = dataset.load_image(i)
            recs = embed_regions(
                img, dets, embed, variables, spec,
                batch_size=args.region_batch_size,
            )
        else:
            recs = []
        regions_per_image.append(recs)
        if (i + 1) % 100 == 0:
            print(f">> regions {i + 1}/{len(dataset)}")

    names = [os.path.basename(str(n)) for n in dataset.image_names]
    save_chestmir_npz(args.output, globals_, labels, names, regions_per_image)
    n_regions = sum(len(r) for r in regions_per_image)
    print(f">> wrote {args.output}: {len(names)} images, {n_regions} regions")


if __name__ == "__main__":
    main()
