"""Shared CLI plumbing: dataset construction, model+checkpoint loading,
argparse fragments reused across entry points (the reference re-declares
these in ~20 scripts; SURVEY.md §5 config sprawl)."""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def add_dataset_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="covid",
                   help="Dataset (covid, isic, tbx11k, vindr, nih, synthetic)")
    p.add_argument("--dataset-dir", default="./data", help="Dataset directory path")
    p.add_argument("--train-image-list", default="./train_split.txt")
    p.add_argument("--val-image-list", default="./val.txt")
    p.add_argument("--val-dataset-dir", default=None)
    p.add_argument("--test-image-list", default="./test.txt")
    p.add_argument("--mask-dir", default=None)
    p.add_argument("--anomaly", action="store_true",
                   help="Drop the anomaly class (COVID/melanoma) from training")


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--model", default="densenet121")
    p.add_argument("--embedding-dim", default=None, type=int)
    p.add_argument("--image-size", default=None, type=int)
    p.add_argument("--sra-num-heads", default=8, type=int)
    p.add_argument("--sra-lam", default=0.1, type=float)
    p.add_argument("--unfreeze-blocks", default=3, type=int)
    p.add_argument("--num-labels", default=None, type=int,
                   help="Dual-branch classification head size")
    p.add_argument("--resume", default="", help="Checkpoint to load (.msgpack or torch .pt/.pth)")
    p.add_argument("--seed", type=int, default=0)


def build_dataset(args, split: str = "train"):
    from ..data import (
        CovidxDataset,
        ISICDataset,
        NIHChestXrayRetrievalDataset,
        SyntheticImageDataset,
        TBX11kDataset,
        VinDrDataset,
    )

    data_dir = args.dataset_dir
    if split == "val" and getattr(args, "val_dataset_dir", None):
        data_dir = args.val_dataset_dir
    manifest = {
        "train": getattr(args, "train_image_list", None),
        "val": getattr(args, "val_image_list", None),
        "test": getattr(args, "test_image_list", None),
    }[split]

    name = args.dataset
    if name == "covid":
        sub = os.path.join(data_dir, split if split != "val" else "train")
        root = sub if os.path.isdir(sub) else data_dir
        return CovidxDataset(
            root, manifest,
            use_covid=not (split == "train" and getattr(args, "anomaly", False)),
            mask_dir=getattr(args, "mask_dir", None),
        )
    if name == "isic":
        return ISICDataset(
            data_dir, manifest,
            use_melanoma=not (split == "train" and getattr(args, "anomaly", False)),
        )
    if name == "tbx11k":
        return TBX11kDataset(data_dir, manifest)
    if name == "vindr":
        return VinDrDataset(data_dir, manifest)
    if name == "nih":
        return NIHChestXrayRetrievalDataset(
            data_dir=data_dir,
            image_list_file=manifest if manifest and os.path.isfile(manifest) else None,
        )
    if name == "synthetic":
        return SyntheticImageDataset(
            n=64 if split == "train" else 32, size=64, seed=0 if split == "train" else 1
        )
    if name == "synthetic_ml":
        from ..data import SyntheticMultiLabelDataset

        return SyntheticMultiLabelDataset(
            n=64 if split == "train" else 32, size=64,
            seed=0 if split == "train" else 1,
        )
    raise ValueError(f"unknown dataset {args.dataset!r}")


def is_multilabel(dataset_name: str) -> bool:
    return dataset_name in ("vindr", "nih", "synthetic_ml")


def build_model(args, train: bool = False):
    """Model + initialized variables (+ checkpoint load with strict=False)."""
    from ..models import create_model
    from ..utils import load_checkpoint, merge_params

    overrides = {}
    if getattr(args, "embedding_dim", None):
        key = "embed_dim" if args.model == "medsiglip" else "embedding_dim"
        if args.model in ("convnextv2_sra", "nih_dinov2", "nih_convnextv2"):
            pass  # these models have fixed output dims in the reference
        else:
            overrides[key] = args.embedding_dim
    if args.model == "convnextv2_sra":
        overrides.update(num_heads=args.sra_num_heads, lam=args.sra_lam)
    if getattr(args, "num_labels", None) and args.model in ("densenet121", "resnet50"):
        overrides["num_labels"] = args.num_labels

    model, spec = create_model(args.model, **overrides)
    size = getattr(args, "image_size", None) or spec.input_size
    x0 = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=train))(
        jax.random.PRNGKey(args.seed), x0
    )
    variables = dict(variables)

    resume = getattr(args, "resume", "")
    if resume:
        if resume.endswith((".pt", ".pth")):
            loaded = _convert_torch_checkpoint(args.model, resume)
        else:
            loaded = load_checkpoint(resume)
        for coll in ("params", "batch_stats"):
            if coll in loaded and coll in variables:
                merged, missing, unexpected = merge_params(
                    variables[coll], loaded[coll]
                )
                variables[coll] = merged
                if missing:
                    print(f">> [{coll}] {len(missing)} leaves kept from init "
                          f"(strict=False load)")
    return model, spec, variables


def _convert_torch_checkpoint(model_name: str, path: str):
    from ..models import convert as C

    sd = C.load_torch_state_dict(path)
    if model_name == "densenet121":
        return C.convert_densenet121_embedder(sd)
    if model_name == "resnet50":
        conv = C.convert_resnet50(sd)
        return {"params": {"backbone": conv["params"]},
                "batch_stats": {"backbone": conv["batch_stats"]}}
    # timm/HF backbones: strip common wrapper prefixes then convert; the
    # embedder fc/head weights merge strict=False on top
    stripped = {}
    for k, v in sd.items():
        for pre in ("convnext.", "swinv2.", "backbone.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        stripped[k] = v
    if model_name.startswith("convnextv2"):
        conv = C.convert_convnextv2_timm(stripped)
        return {"params": {"backbone": conv["params"]}}
    if model_name == "swinv2":
        conv = C.convert_swinv2_timm(stripped)
        return {"params": {"backbone": conv["params"]}}
    if model_name in ("dinov2", "nih_dinov2"):
        conv = C.convert_vit_timm(stripped)
        return {"params": {"backbone": conv["params"]}}
    if model_name == "medsiglip":
        conv = C.convert_siglip_vision(stripped)
        return {"params": {"backbone": conv["params"]}}
    raise ValueError(
        f"no torch-checkpoint converter wired for {model_name!r}; convert "
        "offline via xmir_tpu.models.convert"
    )


def jitted_embed(model):
    from ..train import make_embed_fn

    return jax.jit(make_embed_fn(model))


def add_precision_args(p: argparse.ArgumentParser):
    p.add_argument(
        "--score-precision", default="highest",
        choices=["highest", "default"],
        help="Score-matmul MXU precision for ranking. 'highest' (default for "
             "offline eval) scores in true f32 like the reference "
             "(test.py:1080 torch.cdist / Milvus COSINE); 'default' allows "
             "bf16 MXU rounding (the serving mode — near-ties within ~2^-8 "
             "relative may reorder).",
    )


def apply_score_precision(args):
    """Default BOTH precision envs from --score-precision: XMIR_TOPK_PRECISION
    drives the fused/tiled top-K kernels (ops/topk_pallas.py,
    ops/distance.py), XMIR_EVAL_PRECISION the (N, N) eval similarity matrices
    (metrics/retrieval.py). Explicitly-set envs win over the flag."""
    os.environ.setdefault("XMIR_TOPK_PRECISION", args.score_precision)
    os.environ.setdefault("XMIR_EVAL_PRECISION", args.score_precision)


def add_mesh_arg(p: argparse.ArgumentParser):
    p.add_argument(
        "--use-mesh", action="store_true",
        help="Run the device-side hot loops over all local devices: gallery "
             "embedding shards the batch axis (data-parallel eval, the "
             "reference's DDP + all_gather) and the retrieval index shards "
             "its rows (per-shard fused top-k + cross-shard merge).",
    )


def build_data_mesh(args):
    """The 1-axis data mesh the serving CLIs shard over (or None)."""
    if not getattr(args, "use_mesh", False):
        return None
    from ..parallel import make_mesh
    from ..parallel.mesh import DATA_AXIS

    mesh = make_mesh((jax.device_count(),), axis_names=(DATA_AXIS,))
    print(f">> data mesh over {jax.device_count()} device(s)")
    return mesh
