"""Zero-shot classification CLI (reference test_conceptclip.py /
evaluate_medsiglip.py zero-shot paths): class-prompt text embeddings vs image
embeddings -> accuracy + per-class report + confusion matrix.

Text features come from a dual-encoder checkpoint (ConceptCLIP / MedSigLIP)
or a precomputed class-embedding npz (--class-embeds) for environments
without tokenizers.
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, jitted_embed


def _prompt_text_embeds(args, spec):
    """Class-prompt text embeddings through a fine-tuned dual-encoder text
    tower with real WordPiece tokenization (reference evaluate_medsiglip.py
    zero-shot path: processor(text=prompts) -> get_text_features)."""
    import jax
    import jax.numpy as jnp

    from ..data.wordpiece import BertWordPieceTokenizer
    from ..models import COVIDX_LABEL_TO_TEXT, MedSigLIPDualEncoder
    from ..utils import load_checkpoint, merge_params

    if args.prompts:
        prompt_map = json.load(open(args.prompts))
        class_names = list(prompt_map)
        prompts = [prompt_map[c] for c in class_names]
    else:
        class_names = [str(c) for c in sorted(COVIDX_LABEL_TO_TEXT)]
        prompts = [COVIDX_LABEL_TO_TEXT[int(c)] for c in class_names]

    tok = BertWordPieceTokenizer(args.vocab, max_len=args.seq_len)
    ids, mask = tok.encode_padded(prompts, args.seq_len)

    model = MedSigLIPDualEncoder(
        img_size=spec.input_size, text_vocab=max(args.text_vocab_size, tok.vocab_size),
        dim=args.text_dim, depth=args.text_depth,
    )
    x0 = jnp.zeros((1, spec.input_size, spec.input_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0, jnp.asarray(ids[:1])))(
        jax.random.PRNGKey(0)
    )
    loaded = load_checkpoint(args.dual_checkpoint)
    params = loaded.get("params", loaded)
    merged, missing, _ = merge_params(variables["params"], params)
    if missing:
        print(f">> [text tower] {len(missing)} leaves kept from init")
    feats = jax.jit(
        lambda p, i, m: model.apply(
            {"params": p}, i, m, method=MedSigLIPDualEncoder.get_text_features
        )
    )(merged, jnp.asarray(ids), jnp.asarray(mask))
    feats = np.array(feats, np.float32)
    feats /= np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    return feats, class_names


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu zero-shot classification")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--class-embeds", default="",
                   help="npz with text_embeds (C, D) and optional class_names")
    p.add_argument("--dual-checkpoint", default="",
                   help="MedSigLIP dual-encoder checkpoint: compute class "
                        "text embeds from prompts via the text tower")
    p.add_argument("--vocab", default="",
                   help="Vocab file for WordPiece tokenization of --prompts")
    p.add_argument("--prompts", default="",
                   help="JSON {class_name: prompt}; default COVIDx templates")
    p.add_argument("--seq-len", default=64, type=int)
    p.add_argument("--text-dim", default=1152, type=int)
    p.add_argument("--text-depth", default=27, type=int)
    p.add_argument("--text-vocab-size", default=256000, type=int)
    p.add_argument("--logit-scale", default=np.log(10.0), type=float)
    p.add_argument("--logit-bias", default=0.0, type=float)
    p.add_argument("--eval-batch-size", default=32, type=int)
    p.add_argument("--output", default="")
    args = p.parse_args(argv)

    from ..analysis import zero_shot_classify
    from ..data.pipeline import embed_dataset
    from ..metrics.retrieval import _prf

    dataset = build_dataset(args, "test")
    model, spec, variables = build_model(args, train=False)
    embed = jitted_embed(model)
    img_embeds, labels = embed_dataset(
        dataset, embed, variables, spec, batch_size=args.eval_batch_size
    )
    if args.class_embeds:
        data = np.load(args.class_embeds, allow_pickle=True)
        text_embeds = np.asarray(data["text_embeds"], np.float32)
        class_names = [str(c) for c in data["class_names"]] if "class_names" in data \
            else [str(i) for i in range(text_embeds.shape[0])]
    elif args.dual_checkpoint and args.vocab:
        text_embeds, class_names = _prompt_text_embeds(args, spec)
    else:
        raise SystemExit(
            "provide --class-embeds, or --dual-checkpoint with --vocab to "
            "compute class embeddings from prompts"
        )

    preds, probs = zero_shot_classify(
        img_embeds, text_embeds, args.logit_scale, args.logit_bias
    )
    labels = np.asarray(labels).astype(int)
    acc = float((preds == labels).mean())
    pm, rm, fm = _prf(labels, preds, "macro")
    n_cls = text_embeds.shape[0]
    confusion = np.zeros((n_cls, n_cls), int)
    for t, pr in zip(labels, preds):
        confusion[t, pr] += 1

    print(f">> zero-shot accuracy: {acc * 100:.2f}%")
    print(f">> macro P/R/F1: {pm * 100:.2f} / {rm * 100:.2f} / {fm * 100:.2f}")
    print(">> confusion matrix (rows=true):")
    header = "          " + " ".join(f"{c[:8]:>9}" for c in class_names)
    print(header)
    for i, row in enumerate(confusion):
        print(f"{class_names[i][:9]:<9} " + " ".join(f"{v:>9}" for v in row))
    result = {
        "accuracy": acc, "precision_macro": pm, "recall_macro": rm,
        "f1_macro": fm, "confusion": confusion.tolist(),
        "class_names": class_names,
    }
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
