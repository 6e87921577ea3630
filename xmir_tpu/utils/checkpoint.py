"""Checkpoint save/load: single-file msgpack pytrees with the reference's
metadata-encoding filenames (train.py:622-642) and tolerant loading
(strict=False semantics + {"state_dict"}/{"state-dict"} unwrapping,
train.py:767-778, test.py:1273-1276).

Unlike the reference (which restarts at epoch 1 with a fresh optimizer on
--resume), full train-state checkpoints here carry params + batch_stats +
opt_state + step, so resume is exact.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def checkpoint_name(
    dataset: str,
    model: str,
    embedding_dim: Optional[int] = None,
    anomaly: bool = False,
    rand_resize: bool = False,
    seed: int = 0,
    epoch: Optional[int] = None,
    is_best: bool = False,
) -> str:
    """Reference filename encoding (train.py:622-642), .msgpack extension."""
    name = f"{dataset}_{model}"
    if embedding_dim:
        name += f"_embed_{embedding_dim}"
    if anomaly:
        name += "_anomaly"
    if rand_resize:
        name += "_randresize"
    name += f"_seed_{seed}"
    name += "_best_ckpt" if is_best else f"_epoch_{epoch}_ckpt"
    return name + ".msgpack"


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # to_state_dict converts optax NamedTuple/dataclass states (e.g.
    # multi_transform's PartitionState) into plain nested dicts msgpack accepts
    tree = serialization.to_state_dict(jax.device_get(tree))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return path


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    for key in ("state_dict", "state-dict", "model"):
        if isinstance(tree, dict) and key in tree and isinstance(tree[key], dict):
            tree = tree[key]
            break
    return tree


def merge_params(target: Any, loaded: Any, strict: bool = False):
    """strict=False checkpoint merge: copy matching-by-path-and-shape leaves
    from `loaded` into `target`, keep target values elsewhere. Returns
    (merged, missing_paths, unexpected_paths)."""
    missing, unexpected = [], []

    def walk(t, l, path):
        if isinstance(t, dict):
            out = {}
            l = l if isinstance(l, dict) else {}
            for k, v in t.items():
                if k in l:
                    out[k] = walk(v, l[k], path + (k,))
                else:
                    missing.append("/".join(path + (k,)))
                    out[k] = v
            for k in l:
                if k not in t:
                    unexpected.append("/".join(path + (k,)))
            return out
        arr = np.asarray(l) if l is not None else None
        if arr is not None and hasattr(t, "shape") and arr.shape == t.shape:
            return arr.astype(np.asarray(t).dtype)
        missing.append("/".join(path))
        return t

    merged = walk(target, loaded, ())
    if strict and (missing or unexpected):
        raise ValueError(f"strict load failed: missing={missing}, unexpected={unexpected}")
    return merged, missing, unexpected


class BestCheckpointPolicy:
    """best-mAP + every-10-epochs periodic saving (train.py:1227-1244)."""

    def __init__(self, save_dir: str, name_kwargs: dict, periodic_every: int = 10):
        self.save_dir = save_dir
        self.name_kwargs = name_kwargs
        self.periodic_every = periodic_every
        self.best_metric = 0.0
        self.best_epoch = 0

    def update(self, epoch: int, metric: float, tree: Any) -> Optional[str]:
        saved = None
        if metric > self.best_metric:
            self.best_metric = metric
            self.best_epoch = epoch
            saved = save_checkpoint(
                os.path.join(
                    self.save_dir,
                    checkpoint_name(**self.name_kwargs, epoch=epoch, is_best=True),
                ),
                tree,
                metadata={"epoch": epoch, "metric": metric},
            )
        if epoch % self.periodic_every == 0:
            save_checkpoint(
                os.path.join(
                    self.save_dir,
                    checkpoint_name(**self.name_kwargs, epoch=epoch, is_best=False),
                ),
                tree,
                metadata={"epoch": epoch, "metric": metric},
            )
        return saved
