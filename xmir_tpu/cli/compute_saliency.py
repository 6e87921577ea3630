"""Saliency generation CLI — the reference compute_saliency.py equivalent.

Reference flow (compute_saliency.py:63-129): build explainer (SBSM batch by
default), loop the dataset, save self-saliency maps; or load retrieval
results and explain query-retrieval pairs. The DataParallel mask fan-out
becomes lax.map chunking on the mesh.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, jitted_embed


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu saliency computation")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--explainer", default="sbsm",
                   choices=["sbsm", "simatt", "simcam", "rollout",
                            "gradcam_sim"])
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--window-size", default=24, type=int)
    p.add_argument("--stride", default=5, type=int)
    p.add_argument("--gpu-batch", default=128, type=int,
                   help="Masked-forward chunk size (reference --gpu-batch)")
    p.add_argument("--eval-batch-size", default=8, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--results", default="",
                   help="evaluation_results.npz for pair mode (else self-saliency)")
    p.add_argument("--top-k", default=5, type=int)
    p.add_argument("--save-dir", default="./saliency")
    p.add_argument("--limit", default=0, type=int, help="Max queries (0 = all)")
    p.add_argument("--use-mesh", action="store_true",
                   help="Fan the SBSM mask axis out over all local devices "
                        "(the TPU-native form of the reference's "
                        "DataParallel mask fan-out, compute_saliency.py:67)")
    args = p.parse_args(argv)

    from ..data import batch_iterator, eval_preprocess
    from ..xai import (
        generate_masks,
        sbsm_pair_saliency,
        sbsm_pair_saliency_mesh,
        sbsm_self_saliency,
        sbsm_self_saliency_mesh,
    )

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)
    os.makedirs(args.save_dir, exist_ok=True)
    size = spec.input_size

    mesh = None
    if args.use_mesh:
        import jax

        from ..parallel import make_mesh
        from ..parallel.mesh import DATA_AXIS

        mesh = make_mesh((jax.device_count(),), axis_names=(DATA_AXIS,))
        print(f">> mask fan-out over {mesh.shape} mesh")

    def prep(imgs):
        return eval_preprocess(imgs, spec.resize_size, size, spec.mean, spec.std)

    if args.explainer == "sbsm":
        masks = jnp.asarray(generate_masks(size, args.window_size, args.stride))
        print(f">> {masks.shape[0]} occlusion masks "
              f"(window={args.window_size}, stride={args.stride})")

        def self_saliency(x):
            if mesh is not None:
                return sbsm_self_saliency_mesh(
                    embed, variables, x, masks, mesh, chunk=args.gpu_batch
                )
            return sbsm_self_saliency(
                embed, variables, x, masks, chunk=args.gpu_batch
            )

        def pair_saliency(q_img, r_imgs):
            if mesh is not None:
                return sbsm_pair_saliency_mesh(
                    embed, variables, q_img, r_imgs, masks, mesh,
                    chunk=args.gpu_batch,
                )
            return sbsm_pair_saliency(
                embed, variables, q_img, r_imgs, masks, chunk=args.gpu_batch
            )
        if not args.results:
            count = 0
            for imgs, labs, idxs in batch_iterator(
                dataset, args.eval_batch_size, image_size=spec.resize_size,
                num_workers=args.workers,
            ):
                sal = self_saliency(prep(imgs))
                for j, gi in enumerate(np.asarray(idxs)):
                    np.save(
                        os.path.join(args.save_dir, f"sal_{int(gi):06d}.npy"),
                        np.asarray(sal[j]),
                    )
                count += imgs.shape[0]
                if args.limit and count >= args.limit:
                    break
            print(f">> saved {count} self-saliency maps to {args.save_dir}")
        else:
            data = np.load(args.results, allow_pickle=True)
            dists = data["dists"]
            ranks = np.argsort(-dists, axis=1, kind="stable")[:, : args.top_k]
            n_q = len(dataset) if not args.limit else min(args.limit, len(dataset))
            for qi in range(n_q):
                q_img = prep(dataset.load_image(qi)[None])
                r_imgs = np.stack(
                    [dataset.load_image(int(r)) for r in ranks[qi]]
                )
                sal = pair_saliency(q_img, prep(r_imgs))
                for j, r in enumerate(ranks[qi]):
                    np.save(
                        os.path.join(args.save_dir, f"sal_q{qi:05d}_r{int(r):05d}.npy"),
                        np.asarray(sal[0, j]),
                    )
            print(f">> saved pair saliency for {n_q} queries to {args.save_dir}")
        return

    if args.explainer == "simatt":
        from ..xai import get_feature_head, simatt_saliency

        head_fn = get_feature_head(args.model, variables["params"])

        def features_fn(xs):
            return model.apply(variables, xs)["features"]

        data = np.load(args.results, allow_pickle=True) if args.results else None
        n_q = args.limit or min(len(dataset), 16)
        for qi in range(n_q):
            if data is not None:
                ranks = np.argsort(-data["dists"][qi], kind="stable")[: args.top_k]
                stack = np.stack([dataset.load_image(qi)] +
                                 [dataset.load_image(int(r)) for r in ranks])
            else:
                stack = dataset.load_image(qi)[None].repeat(2, axis=0)
            sal = simatt_saliency(features_fn, head_fn, prep(stack), n_pos=1)
            np.save(os.path.join(args.save_dir, f"simatt_q{qi:05d}.npy"),
                    np.asarray(sal))
        print(f">> saved SimAtt maps for {n_q} anchors to {args.save_dir}")
        return

    if args.explainer == "simcam":
        from ..xai import simcam_maps

        n_q = args.limit or min(len(dataset), 16)
        for qi in range(n_q):
            q_feats = model.apply(variables, prep(dataset.load_image(qi)[None]))[
                "features"
            ][0]
            r_feats = model.apply(
                variables, prep(dataset.load_image((qi + 1) % len(dataset))[None])
            )["features"]
            maps = simcam_maps(q_feats, r_feats, out_hw=(size, size))
            np.save(os.path.join(args.save_dir, f"simcam_q{qi:05d}.npy"),
                    np.asarray(maps))
        print(f">> saved SimCAM maps for {n_q} pairs to {args.save_dir}")
        return

    if args.explainer == "gradcam_sim":
        # Grad-CAM of cosine(query, retrieved) on ViT tokens
        # (reference medsiglip_saliency.py:51-131)
        from ..xai import make_vit_gradcam_fn, vit_gradcam_similarity

        apply_fn = make_vit_gradcam_fn(model)
        data = np.load(args.results, allow_pickle=True) if args.results else None
        n_q = args.limit or min(len(dataset), 16)
        for qi in range(n_q):
            q_img = prep(dataset.load_image(qi)[None])
            if data is not None:
                ranks = np.argsort(-data["dists"][qi], kind="stable")[: args.top_k]
            else:
                ranks = np.asarray([(qi + 1) % len(dataset)])
            r_imgs = prep(np.stack([dataset.load_image(int(r)) for r in ranks]))
            q_emb = embed(variables, q_img)[0]
            maps = vit_gradcam_similarity(
                apply_fn, variables, q_emb, r_imgs, out_hw=(size, size)
            )
            for j, r in enumerate(ranks):
                np.save(
                    os.path.join(
                        args.save_dir, f"gradcam_q{qi:05d}_r{int(r):05d}.npy"
                    ),
                    np.asarray(maps[j]),
                )
        print(f">> saved grad-CAM similarity maps for {n_q} queries to "
              f"{args.save_dir}")
        return

    if args.explainer == "rollout":
        from ..xai import rollout_saliency

        n_q = args.limit or min(len(dataset), 16)
        for qi in range(n_q):
            out = model.apply(
                variables, prep(dataset.load_image(qi)[None]),
                train=False, output_attentions=True,
            )
            sal = rollout_saliency(out["attentions"], (size, size))
            np.save(os.path.join(args.save_dir, f"rollout_q{qi:05d}.npy"),
                    np.asarray(sal))
        print(f">> saved rollout maps for {n_q} images to {args.save_dir}")


if __name__ == "__main__":
    main()
