"""Single-pair insertion/deletion debug twin (reference
debug_insertion_deletion.py, debug_single_image_pipeline.py): run one
query-retrieval pair with per-step score logging — the step-level visibility
the reference uses in place of unit tests (SURVEY.md §4.2)."""
from __future__ import annotations

import argparse

import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, jitted_embed


def main(argv=None):
    p = argparse.ArgumentParser(description="single-pair ins/del debug")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--query-index", default=0, type=int)
    p.add_argument("--retrieved-index", default=-1, type=int,
                   help="-1 = top-1 neighbor of the query")
    p.add_argument("--window-size", default=24, type=int)
    p.add_argument("--stride", default=5, type=int)
    p.add_argument("--gpu-batch", default=128, type=int)
    p.add_argument("--step", default=1000, type=int)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..data import eval_preprocess
    from ..metrics.saliency import auc as auc_fn
    from ..xai import (
        blur_substrate,
        causal_scores,
        generate_masks,
        saliency_rank,
        sbsm_pair_saliency,
        zeros_substrate,
    )

    dataset = build_dataset(args, args.split)
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)
    size = spec.input_size

    def prep(imgs):
        return eval_preprocess(imgs, spec.resize_size, size, spec.mean, spec.std)

    qi = args.query_index
    q_img = prep(dataset.load_image(qi)[None])
    q_feat = embed(variables, q_img)[0]

    ri = args.retrieved_index
    if ri < 0:
        from ..index import ShardedGalleryIndex
        from ..data.pipeline import embed_dataset

        embeds, _ = embed_dataset(dataset, embed, variables, spec)
        idx = ShardedGalleryIndex(embeds.shape[1])
        idx.add(embeds)
        idx.build()
        _, ids = idx.search(embeds[qi : qi + 1], k=2)
        ri = int(np.asarray(ids)[0, 1])  # skip self
        print(f">> top-1 neighbor of query {qi}: {ri}")
    r_img = prep(dataset.load_image(ri)[None])

    print(f">> SBSM saliency for pair ({qi}, {ri}) ...")
    masks = jnp.asarray(generate_masks(size, args.window_size, args.stride))
    sal = np.asarray(
        sbsm_pair_saliency(embed, variables, q_img, r_img, masks,
                           chunk=args.gpu_batch)
    )[0, 0]
    print(f"   saliency: min {sal.min():.4f} max {sal.max():.4f} "
          f"mean {sal.mean():.4f}")

    ranks = saliency_rank(jnp.asarray(sal))
    for mode, sub in (("del", zeros_substrate), ("ins", blur_substrate())):
        if mode == "del":
            start, finish = r_img[0], sub(r_img)[0]
        else:
            start, finish = sub(r_img)[0], r_img[0]
        scores = np.asarray(
            causal_scores(embed, variables, q_feat, start, finish, ranks,
                          args.step, batch_steps=8)
        )
        n_steps = len(scores) - 1
        print(f"\n== {mode} (step={args.step} px, {n_steps} steps) ==")
        for i, s in enumerate(scores):
            pct = 100.0 * i / max(n_steps, 1)
            bar = "#" * int(max(s, 0.0) * 40)
            print(f"  {pct:5.1f}%  score {s:+.4f}  {bar}")
        clipped = np.clip(scores, 0.0, 1.0)
        print(f"  -> AUC {auc_fn(clipped):.4f}, "
              f"{int((scores < 0).sum())} negative clips")


if __name__ == "__main__":
    main()
