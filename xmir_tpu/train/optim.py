"""Optimizer construction: per-part learning rates, freeze masks, grad clip.

Replicates the reference's optimizer policies the optax way:
  - grad-clip 5.0 then Adam        (train.py:98-101, train_epoch)
  - backbone at 0.1x lr, heads 1x  (train.py:812-926 param groups)
  - AdamW with backbone-lr/head-lr (nih_multilabel_retrieval.py:260-280)
  - "unfreeze last N blocks" as a zero-gradient mask instead of
    requires_grad mutation (model.py:465-482, 575-583, 648-703)
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def label_params(params, classify: Callable[[str], str]):
    """Label each param leaf by classify(path_string)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: classify(_path_str(path)), params
    )


def backbone_head_labels(params, backbone_prefixes: Sequence[str] = ("backbone",)):
    def classify(path: str) -> str:
        return (
            "backbone"
            if any(path.startswith(p) for p in backbone_prefixes)
            else "head"
        )

    return label_params(params, classify)


def build_optimizer(
    params,
    lr: float = 1e-4,
    backbone_lr_scale: float = 0.1,
    clip_norm: float = 5.0,
    weight_decay: float = 0.0,
    backbone_prefixes: Sequence[str] = ("backbone",),
    frozen_predicate: Callable[[str], bool] | None = None,
    mu_dtype=None,
):
    """Adam(W) with grad clipping, per-part LRs, and optional frozen subtrees.

    frozen_predicate(path) -> True freezes that leaf (gradient zeroed), the
    optax equivalent of requires_grad=False partial fine-tuning.

    mu_dtype: dtype of Adam's FIRST moment (optax mu_dtype; second moment
    stays f32). bf16 halves the first-moment HBM state+traffic; on the
    540M-param ConceptCLIP step that relieves enough memory pressure for
    +25% throughput (35.5 -> 44.5 img/s, BENCHMARKS.md round-5 profile).
    Default None = f32 (the reference's torch.optim.Adam behavior).
    """
    def make(lr_):
        opt = (
            optax.adamw(lr_, weight_decay=weight_decay, mu_dtype=mu_dtype)
            if weight_decay
            else optax.adam(lr_, mu_dtype=mu_dtype)
        )
        return optax.chain(optax.clip_by_global_norm(clip_norm), opt)

    def classify(path: str) -> str:
        if frozen_predicate is not None and frozen_predicate(path):
            return "frozen"
        if any(path.startswith(p) for p in backbone_prefixes):
            return "backbone"
        return "head"

    labels = label_params(params, classify)
    return optax.multi_transform(
        {
            "backbone": make(lr * backbone_lr_scale),
            "head": make(lr),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )


def unfreeze_last_blocks_predicate(
    num_blocks_total: int,
    unfreeze_blocks: int,
    block_prefix: str = "backbone/block",
    always_trainable: Sequence[str] = ("backbone/norm", "fc", "head", "projection"),
):
    """Freeze everything in the backbone except the last N transformer blocks
    and the final norm (reference DinoV2 policy, model.py:465-482)."""
    trainable_blocks = {
        f"{block_prefix}{i}" for i in range(num_blocks_total - unfreeze_blocks, num_blocks_total)
    }

    def frozen(path: str) -> bool:
        for p in always_trainable:
            if path.startswith(p):
                return False
        for b in trainable_blocks:
            if path.startswith(b):
                return False
        return path.startswith("backbone")

    return frozen
