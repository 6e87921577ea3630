"""Insertion/deletion saliency evaluation CLI — the reference
evaluate_saliency.py / evaluate_test_dataset_milvus.py equivalent.

Per query: retrieve top-k, load/compute saliency per pair, run deletion
(substrate zeros) and insertion (gaussian blur) causal metrics, aggregate per
class, save incremental JSON (reference evaluate_test_dataset_milvus.py:
428-437 substrates, 577-584 incremental save, 688-700 quality heuristics).
"""
from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from .common import (
    add_dataset_args,
    add_model_args,
    add_precision_args,
    apply_score_precision,
    build_dataset,
    build_model,
    jitted_embed,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu insertion/deletion eval")
    add_dataset_args(p)
    add_model_args(p)
    add_precision_args(p)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--saliency-dir", default="",
                   help="Precomputed maps (sal_q{q}_r{r}.npy); computed on the fly when empty")
    p.add_argument(
        "--explainer", default="sbsm",
        choices=["sbsm", "simatt", "simcam", "rollout", "gradcam_sim"],
        help="Inline saliency (reference evaluate_test_dataset_milvus.py:"
             "368-426 selects any explainer inline). simatt/simcam need a "
             "conv backbone exposing 'features'; rollout/gradcam_sim need a "
             "ViT exposing attentions/token taps (medsiglip).",
    )
    p.add_argument("--window-size", default=24, type=int)
    p.add_argument("--stride", default=5, type=int)
    p.add_argument("--gpu-batch", default=128, type=int)
    p.add_argument("--top-k", default=5, type=int)
    p.add_argument("--step", default=1000, type=int,
                   help="Pixels per ins/del step (reference milvus driver uses 1000)")
    p.add_argument("--limit", default=0, type=int)
    p.add_argument("--save-every", default=10, type=int)
    p.add_argument("--skip-existing", action="store_true",
                   help="Resume: skip queries already present in --output "
                        "(reference evaluate_test_dataset_milvus.py:252-299)")
    p.add_argument("--output", default="insertion_deletion_results.json")
    p.add_argument("--use-mesh", action="store_true",
                   help="Fan the SBSM mask axis + the ins/del pair axis out "
                        "over all local devices, and shard the retrieval "
                        "gallery row-wise (the multi-device form of the "
                        "reference's DataParallel saliency evaluation)")
    args = p.parse_args(argv)
    apply_score_precision(args)

    from ..data import eval_preprocess
    from ..data.pipeline import embed_dataset
    from ..index import ShardedGalleryIndex
    from ..metrics.saliency import saliency_quality
    from ..xai import (
        blur_substrate,
        generate_masks,
        run_causal_metric_pairs_both,
        sbsm_pair_saliency,
        sbsm_pair_saliency_mesh,
        zeros_substrate,
    )

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)
    size = spec.input_size

    mesh = None
    if args.use_mesh:
        import jax

        from ..parallel import make_mesh
        from ..parallel.mesh import DATA_AXIS

        mesh = make_mesh((jax.device_count(),), axis_names=(DATA_AXIS,))
        print(f">> XAI fan-out + sharded gallery over {mesh.shape} mesh")

    def prep(imgs):
        return eval_preprocess(imgs, spec.resize_size, size, spec.mean, spec.std)

    print(f">> embedding {len(dataset)} gallery images ...")
    embeds, labels = embed_dataset(dataset, embed, variables, spec, mesh=mesh)
    idx = ShardedGalleryIndex(embeds.shape[1])
    idx.add(embeds, labels, [str(n) for n in dataset.image_names])
    idx.build(mesh)
    _, topk_ids = idx.search(
        embeds, k=args.top_k, exclude_ids=np.arange(len(dataset))
    )
    topk_ids = np.asarray(topk_ids)

    blur = blur_substrate()
    n_q = min(args.limit or len(dataset), len(dataset))

    # inline per-pair saliency provider: (q_img (1,H,W,C), r_imgs (P,H,W,C))
    # -> list of P (H, W) maps over the retrieved images
    if args.explainer == "sbsm":
        masks = jnp.asarray(generate_masks(size, args.window_size, args.stride))

        def pair_saliency(q_img, r_imgs):
            if mesh is not None:
                sal = sbsm_pair_saliency_mesh(
                    embed, variables, q_img, r_imgs, masks, mesh,
                    chunk=args.gpu_batch,
                )
            else:
                sal = sbsm_pair_saliency(
                    embed, variables, q_img, r_imgs, masks, chunk=args.gpu_batch
                )
            return [np.asarray(sal[0, j]) for j in range(r_imgs.shape[0])]
    elif args.explainer == "simatt":
        from ..xai import get_feature_head, simatt_saliency

        head_fn = get_feature_head(args.model, variables["params"])

        def features_fn(xs):
            return model.apply(variables, xs)["features"]

        def pair_saliency(q_img, r_imgs):
            stack = jnp.concatenate([q_img, r_imgs], axis=0)
            maps = simatt_saliency(features_fn, head_fn, stack, n_pos=1)
            return [np.asarray(m) for m in maps[1:]]
    elif args.explainer == "simcam":
        from ..xai import simcam_maps

        def pair_saliency(q_img, r_imgs):
            q_feats = model.apply(variables, q_img)["features"][0]
            r_feats = model.apply(variables, r_imgs)["features"]
            maps = simcam_maps(q_feats, r_feats, out_hw=(size, size))
            # index 1 = retrieval-side map (the perturbed image)
            return [np.asarray(maps[j, 1]) for j in range(r_imgs.shape[0])]
    elif args.explainer == "rollout":
        from ..xai import rollout_saliency

        def pair_saliency(q_img, r_imgs):
            out = model.apply(
                variables, r_imgs, train=False, output_attentions=True
            )
            sal = rollout_saliency(out["attentions"], (size, size))
            return [np.asarray(sal[j]) for j in range(r_imgs.shape[0])]
    else:  # gradcam_sim
        from ..xai import make_vit_gradcam_fn, vit_gradcam_similarity

        apply_fn = make_vit_gradcam_fn(model)

        def pair_saliency(q_img, r_imgs):
            q_emb = embed(variables, q_img)[0]
            maps = vit_gradcam_similarity(
                apply_fn, variables, q_emb, r_imgs, out_hw=(size, size)
            )
            return [np.asarray(maps[j]) for j in range(r_imgs.shape[0])]

    results = []
    done = set()
    if args.skip_existing and os.path.exists(args.output):
        prior = json.load(open(args.output))
        results = prior.get("results", prior if isinstance(prior, list) else [])
        done = {r["query_index"] for r in results}
        print(f">> resuming: {len(done)} queries already evaluated")
    for qi in range(n_q):
        if qi in done:
            continue
        q_img = prep(dataset.load_image(qi)[None])
        r_raw = np.stack([dataset.load_image(int(r)) for r in topk_ids[qi]])
        r_imgs = prep(r_raw)
        if args.saliency_dir:
            sals = [
                np.load(os.path.join(
                    args.saliency_dir, f"sal_q{qi:05d}_r{int(r):05d}.npy"))
                for r in topk_ids[qi]
            ]
        else:
            sals = pair_saliency(q_img, r_imgs)

        # deletion + insertion batched TOGETHER across the top-k pairs: one
        # forward embeds a throughput-tuned chunk of both curves' reveal
        # images (2 x top_k pairs; auto_batch_steps sizes the chunks)
        del_res, ins_res = run_causal_metric_pairs_both(
            embed, variables, q_img[0], r_imgs, sals,
            zeros_substrate, blur, step=args.step, mesh=mesh,
        )
        del_aucs = [a for a, _ in del_res]
        ins_aucs = [a for a, _ in ins_res]
        rec = {
            "query_index": qi,
            "query_label": np.asarray(dataset.labels[qi]).tolist(),
            "retrieved": topk_ids[qi].tolist(),
            "deletion_auc": float(np.mean(del_aucs)),
            "insertion_auc": float(np.mean(ins_aucs)),
            "per_pair_del": [float(a) for a in del_aucs],
            "per_pair_ins": [float(a) for a in ins_aucs],
        }
        rec["good_saliency"] = saliency_quality(
            rec["deletion_auc"], rec["insertion_auc"]
        )
        results.append(rec)
        if (qi + 1) % args.save_every == 0 or qi == n_q - 1:
            _save(args.output, results)
            print(f">> [{qi + 1}/{n_q}] del={rec['deletion_auc']:.3f} "
                  f"ins={rec['insertion_auc']:.3f}")

    mean_del = float(np.mean([r["deletion_auc"] for r in results]))
    mean_ins = float(np.mean([r["insertion_auc"] for r in results]))
    print(f">> mean deletion AUC {mean_del:.4f} (good < 0.6), "
          f"mean insertion AUC {mean_ins:.4f} (good > 0.7)")
    # per-class averages (reference AverageCounter, evaluate_saliency.py:95-116)
    per_class: dict = {}
    for r in results:
        key = str(r["query_label"])
        per_class.setdefault(key, {"del": [], "ins": []})
        per_class[key]["del"].append(r["deletion_auc"])
        per_class[key]["ins"].append(r["insertion_auc"])
    per_class_avg = {
        k: {
            "deletion_auc": float(np.mean(v["del"])),
            "insertion_auc": float(np.mean(v["ins"])),
            "n": len(v["del"]),
        }
        for k, v in per_class.items()
    }
    for k, v in sorted(per_class_avg.items()):
        print(f">> class {k}: del {v['deletion_auc']:.4f} "
              f"ins {v['insertion_auc']:.4f} (n={v['n']})")
    _save(args.output, results, summary={
        "mean_deletion_auc": mean_del, "mean_insertion_auc": mean_ins,
        "n_queries": len(results), "per_class": per_class_avg,
        # deployment-shape evidence: which retrieval path served the top-k
        # and whether the XAI fan-out ran on a mesh (replayed by
        # tests/test_demo_artifact.py for the committed chip artifact)
        "use_mesh": mesh is not None,
        "mesh_devices": None if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        ),
        "index": idx.info(),
    })


def _save(path, results, summary=None):
    payload = {"results": results}
    if summary:
        payload["summary"] = summary
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
