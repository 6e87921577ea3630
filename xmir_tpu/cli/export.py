"""Model export CLI (reference convert_to_onnx.py / ChestMIR convert_onnx.py
role): export a trained checkpoint either as a torch-layout state dict
(loadable by the reference's own torchvision/timm/HF tooling) or as a TF
SavedModel via jax2tf (convertible onward to ONNX with tf2onnx)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from .common import add_model_args, build_model


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu model export")
    add_model_args(p)
    p.add_argument("--format", default="torch",
                   choices=["torch", "savedmodel"])
    p.add_argument("--output", required=True,
                   help="torch: .pt/.pth/.npz file; savedmodel: directory")
    p.add_argument("--batch", default=1, type=int,
                   help="savedmodel: exported batch dim (use 0 for dynamic)")
    args = p.parse_args(argv)

    model, spec, variables = build_model(args, train=False)
    size = getattr(args, "image_size", None) or spec.input_size

    from ..models import export as export_mod

    if args.format == "torch":
        sd = export_mod.export_backbone(args.model, variables)
        out = export_mod.save_torch_state_dict(sd, args.output)
        print(f">> exported {len(sd)} tensors ({args.model}, torch layout) "
              f"-> {out}")
        return out
    batch = args.batch if args.batch > 0 else None
    out = export_mod.export_savedmodel(
        model, variables, args.output, (batch, size, size, 3)
    )
    print(f">> exported TF SavedModel -> {out}")
    return out


if __name__ == "__main__":
    main()
