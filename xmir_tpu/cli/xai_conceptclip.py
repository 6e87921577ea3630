"""ConceptCLIP patch-concept XAI CLI (reference xai_conceptclip.py):
encode a gallery of CLS + patch embeddings, retrieve top-K for query images,
and explain WHY each result is relevant via patch-concept attention —
top detected concepts, shared findings, spatial heatmaps, and a text report.

Outputs per query: <out>/<query>_explanation.json (+ .txt), and
<out>/<query>_explanation.png when --render is set.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, build_dataset


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu ConceptCLIP patch-concept XAI")
    add_dataset_args(p)
    p.add_argument("--checkpoint", default="", help="ConceptCLIP msgpack checkpoint")
    p.add_argument("--vocab", default="", help="vocab.txt for WordPiece")
    p.add_argument("--vocab-size", default=30000, type=int)
    p.add_argument("--seq-len", default=64, type=int)
    p.add_argument("--image-size", default=384, type=int)
    p.add_argument("--dim", default=1152, type=int)
    p.add_argument("--depth", default=27, type=int)
    p.add_argument("--text-depth", default=12, type=int)
    p.add_argument("--batch-size", default=16, type=int)
    p.add_argument("--top-k", default=5, type=int)
    p.add_argument("--top-k-concepts", default=5, type=int)
    p.add_argument("--num-images", default=0, type=int,
                   help="Limit gallery size (0 = all)")
    p.add_argument("--num-query-samples", default=3, type=int)
    p.add_argument("--query-index", default=-1, type=int,
                   help="Explain one specific gallery index")
    p.add_argument("--render", action="store_true",
                   help="Save matplotlib composite figures")
    p.add_argument("--out-dir", default="./xai_conceptclip")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..data import VINDR_CONCEPT_COLUMNS, batch_iterator, eval_preprocess
    from ..data.wordpiece import build_text_tokenizer
    from ..models.embedders import ConceptCLIPModel
    from ..models.registry import SIGLIP_MEAN, SIGLIP_STD
    from ..utils import load_checkpoint, merge_params
    from ..xai.conceptxai import (
        explain_retrieval,
        render_retrieval_explanation,
        text_explanation,
    )

    ds = build_dataset(args, "test")
    if hasattr(ds, "concept_names"):
        concept_names = list(ds.concept_names)
    elif args.dataset == "vindr":
        concept_names = list(VINDR_CONCEPT_COLUMNS)
    else:
        concept_names = list(VINDR_CONCEPT_COLUMNS)
    concept_texts = [f"a finding of {c.lower()}" for c in concept_names]

    tok = build_text_tokenizer(args.vocab or None, args.vocab_size, args.seq_len)
    model = ConceptCLIPModel(
        img_size=args.image_size, dim=args.dim, depth=args.depth,
        text_depth=args.text_depth,
        text_vocab=max(args.vocab_size, getattr(tok, "vocab_size", 0)),
    )
    pix0 = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    ids0 = jnp.zeros((1, args.seq_len), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, pix0, ids0, None, method=model.forward_clip)
    )(jax.random.PRNGKey(args.seed))
    params = variables["params"]
    if args.checkpoint:
        loaded = load_checkpoint(args.checkpoint)
        params, missing, _ = merge_params(
            params, loaded.get("params", loaded)
        )
        if missing:
            print(f">> {len(missing)} leaves kept from init (strict=False)")

    encode_image = jax.jit(
        lambda p, x: model.apply(
            {"params": p}, x, method=ConceptCLIPModel.encode_image
        )
    )
    encode_text = jax.jit(
        lambda p, i, m: model.apply(
            {"params": p}, i, m, method=ConceptCLIPModel.encode_text
        )
    )

    # concept text embeddings (reference encode_concepts)
    ids, mask = tok.encode_padded(concept_texts, args.seq_len)
    concept_embeds = np.asarray(
        encode_text(params, jnp.asarray(ids), jnp.asarray(mask)), np.float32
    )

    # gallery: CLS + patch embeddings (reference encode_all_images)
    n = len(ds) if not args.num_images else min(args.num_images, len(ds))
    cls_list, tok_list, raw_images = [], [], []
    for imgs, _, idxs in batch_iterator(
        ds, args.batch_size, indices=range(n),
        image_size=int(args.image_size * 432 / 384),
    ):
        x = eval_preprocess(
            imgs, int(args.image_size * 432 / 384), args.image_size,
            SIGLIP_MEAN, SIGLIP_STD,
        )
        pooled, tokens = encode_image(params, x)
        cls_list.append(np.asarray(pooled, np.float32))
        tok_list.append(np.asarray(tokens, np.float32))
        raw_images.extend(np.asarray(imgs))
    cls_embeds = np.concatenate(cls_list)
    cls_embeds /= np.maximum(
        np.linalg.norm(cls_embeds, axis=1, keepdims=True), 1e-12
    )
    patch_embeds = np.concatenate(tok_list)
    image_ids = [str(getattr(ds, "image_names", range(n))[i]) for i in range(n)]
    print(f">> encoded {n} images: cls {cls_embeds.shape}, "
          f"patches {patch_embeds.shape}")

    if args.query_index >= 0:
        queries = [args.query_index]
    else:
        rng = np.random.default_rng(args.seed)
        queries = rng.choice(n, size=min(args.num_query_samples, n),
                             replace=False).tolist()

    os.makedirs(args.out_dir, exist_ok=True)
    results = []
    for q in queries:
        sims = cls_embeds @ cls_embeds[q]
        sims[q] = -np.inf
        order = np.argsort(-sims)[: args.top_k]
        exp = explain_retrieval(
            patch_embeds[q], patch_embeds[order], concept_embeds,
            concept_names, sims[order], [image_ids[i] for i in order],
            query_id=image_ids[q], top_k_concepts=args.top_k_concepts,
        )
        report = text_explanation(exp)
        stem = os.path.join(
            args.out_dir, os.path.splitext(os.path.basename(image_ids[q]))[0]
        )
        serializable = {
            k: v for k, v in exp.items()
            if k not in ("query_attention", "retrieved_attention")
        }
        with open(stem + "_explanation.json", "w") as f:
            json.dump(serializable, f, indent=2)
        with open(stem + "_explanation.txt", "w") as f:
            f.write(report)
        if args.render:
            render_retrieval_explanation(
                exp, raw_images[q], [raw_images[i] for i in order],
                stem + "_explanation.png",
            )
        print(report)
        results.append(serializable)
    return results


if __name__ == "__main__":
    main()
