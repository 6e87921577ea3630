"""ConceptCLIP fine-tuning CLI (reference train.py --model conceptclip path,
train.py:221-397): VinDr concept-rich captions -> IT-Align + RC-Align
training of the dual encoder, with per-sample concept texts padded for the
RC loss and the post-step logit_scale clamp.

Text goes through the deterministic hash tokenizer (data/tokenizer.py) since
HF tokenizers need network access; pass --token-table to map words to a real
vocabulary.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, build_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu ConceptCLIP fine-tuning")
    add_dataset_args(p)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--epochs", default=3, type=int)
    p.add_argument("--batch-size", default=8, type=int)
    p.add_argument("--lr", default=1e-5, type=float)
    p.add_argument("--weight-decay", default=0.01, type=float)
    p.add_argument("--rc-alpha", default=0.5, type=float)
    p.add_argument("--unfreeze-vision-layers", default=4, type=int)
    p.add_argument("--unfreeze-text-layers", default=2, type=int)
    p.add_argument("--max-concepts", default=8, type=int)
    p.add_argument("--seq-len", default=64, type=int)
    p.add_argument("--concept-len", default=16, type=int)
    p.add_argument("--token-table", default="")
    p.add_argument("--vocab", default="",
                   help="BERT vocab.txt: use real WordPiece tokenization "
                        "(matches transformers.BertTokenizer)")
    p.add_argument("--image-size", default=384, type=int)
    p.add_argument("--dim", default=1152, type=int)
    p.add_argument("--depth", default=27, type=int)
    p.add_argument("--text-depth", default=12, type=int)
    p.add_argument("--vocab-size", default=30000, type=int)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--adam-mu-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="Adam first-moment dtype. bf16 (default) halves the "
                        "first-moment HBM state and measured +25% step "
                        "throughput on the 540M-param dual encoder "
                        "(35.5 -> 44.5 img/s, BENCHMARKS.md); float32 "
                        "restores the reference's torch Adam numerics")
    p.add_argument("--no-dedupe-concepts", action="store_true",
                   help="encode every (b, w) concept slot per step like the "
                        "reference instead of unique concepts + gather")
    p.add_argument("--print-freq", default=5, type=int)
    p.add_argument("--save", default="./checkpoints/conceptclip.msgpack")
    args = p.parse_args(argv)

    from ..data import batch_iterator, eval_preprocess
    from ..data.tokenizer import HashWordTokenizer
    from ..models.registry import SIGLIP_MEAN, SIGLIP_STD
    from ..train import (
        build_optimizer,
        create_train_state,
        dedupe_concept_batch,
        make_conceptclip_train_step,
    )
    from ..utils import save_checkpoint

    if args.dataset == "vindr":
        from ..data import VinDrConceptCLIPDataset

        ds = VinDrConceptCLIPDataset(args.dataset_dir, args.train_image_list)
    else:
        ds = build_dataset(args, "train")
        if not hasattr(ds, "get_text"):
            # smoke-test shim: class-name captions, no concepts
            from ..data.synthetic import COVIDX_CLASS_NAMES

            def _get_text(i, _ds=ds):
                name = COVIDX_CLASS_NAMES[int(_ds.labels[i]) % 3]
                return f"A chest X-ray consistent with {name}.", [name]

            ds.get_text = _get_text
    table = (
        {w: int(i) for w, i in json.load(open(args.token_table)).items()}
        if args.token_table
        else None
    )
    if args.vocab:
        from ..data.wordpiece import BertWordPieceTokenizer

        tok = BertWordPieceTokenizer(args.vocab, max_len=args.seq_len)
        args.vocab_size = max(args.vocab_size, tok.vocab_size)
    else:
        tok = HashWordTokenizer(args.vocab_size, args.seq_len, table)

    from ..models.embedders import ConceptCLIPModel

    # registry conceptclip uses full SO400M/BERT sizes by default; the flags
    # above allow smaller configs for smoke runs
    model = ConceptCLIPModel(
        img_size=args.image_size, dim=args.dim, depth=args.depth,
        text_depth=args.text_depth, text_vocab=args.vocab_size,
    )
    s = args.image_size
    pix0 = jnp.zeros((2, s, s, 3), jnp.float32)
    ids0 = jnp.zeros((2, args.seq_len), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, pix0, ids0, None, method=model.forward_clip)
    )(jax.random.PRNGKey(args.seed))

    nv, nt = args.depth, args.text_depth

    def frozen(path: str) -> bool:
        # freeze all but last N vision/text layers + norms/heads/scales
        # (reference model.py:648-703 policy)
        if path.startswith("visual"):
            for i in range(nv - args.unfreeze_vision_layers, nv):
                if path.startswith(f"visual/layer{i}"):
                    return False
            return "post_layernorm" not in path and "head" not in path
        if path.startswith("text/"):
            for i in range(nt - args.unfreeze_text_layers, nt):
                if path.startswith(f"text/layer{i}"):
                    return False
            return True
        return False  # projection, logit scale/bias always train

    tx = build_optimizer(
        variables["params"], lr=args.lr, backbone_lr_scale=1.0,
        weight_decay=args.weight_decay, frozen_predicate=frozen,
        mu_dtype=jnp.bfloat16 if args.adam_mu_dtype == "bfloat16" else None,
    )
    state = create_train_state(model, jax.random.PRNGKey(args.seed), None, tx,
                               variables=variables)
    step = jax.jit(
        make_conceptclip_train_step(
            model, alpha=args.rc_alpha,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            dedupe_concepts=not args.no_dedupe_concepts,
        )
    )

    resize = int(s * 432 / 384)
    w_c, lc = args.max_concepts, args.concept_len

    for epoch in range(1, args.epochs + 1):
        t0, last = time.time(), {}
        order = np.random.default_rng(args.seed + epoch).permutation(len(ds))
        for bi, (imgs, _, idxs) in enumerate(
            batch_iterator(ds, args.batch_size, indices=order.tolist(),
                           image_size=resize, drop_last=True)
        ):
            texts, concept_lists = [], []
            for gi in np.asarray(idxs):
                text, concepts = ds.get_text(int(gi))
                texts.append(text)
                concept_lists.append(concepts[:w_c])
            ids, mask = tok.encode_padded(texts, args.seq_len)
            cids = np.zeros((len(texts), w_c, lc), np.int32)
            cmask = np.zeros((len(texts), w_c), bool)
            ctok_mask = np.zeros((len(texts), w_c, lc), bool)
            for i, cl in enumerate(concept_lists):
                for j, cname in enumerate(cl):
                    e, m = tok.encode_padded([cname], lc)
                    cids[i, j] = e[0]
                    ctok_mask[i, j] = m[0]
                    cmask[i, j] = True
            x = eval_preprocess(imgs, resize, s, SIGLIP_MEAN, SIGLIP_STD)
            if args.no_dedupe_concepts:
                state, last = step(
                    state, x, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(cids), jnp.asarray(cmask),
                    jnp.asarray(ctok_mask),
                )
            else:
                u_ids, u_mask, inverse = dedupe_concept_batch(cids, ctok_mask)
                state, last = step(
                    state, x, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(u_ids), jnp.asarray(cmask),
                    jnp.asarray(u_mask), jnp.asarray(inverse),
                )
            if bi % args.print_freq == 0:
                print(f"epoch {epoch} step {bi}: loss {float(last['loss']):.4f} "
                      f"(it {float(last['it_loss']):.4f}, "
                      f"rc {float(last['rc_loss']):.4f})")
        print(f">> epoch {epoch} in {time.time() - t0:.1f}s")

    save_checkpoint(args.save, {"params": state.params})
    print(f">> saved {args.save}")


if __name__ == "__main__":
    main()
