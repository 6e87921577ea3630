"""Metric-learning training CLI — the reference train.py equivalent.

Reference flow (train.py:645-1260): model select, loss auto-select, PK batch
sampling, Adam + grad-clip 5.0 with backbone/head LR groups, eval-every-N
with cosine mAP/R@K, best-mAP checkpointing. DDP is replaced by sharding the
batch over the mesh data axis (XLA inserts the gradient psum).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, add_model_args, build_dataset, build_model, is_multilabel, jitted_embed


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu embedding learning")
    add_dataset_args(p)
    add_model_args(p)
    p.add_argument("--rand-resize", action="store_true")
    p.add_argument("-p", "--labels-per-batch", default=3, type=int)
    p.add_argument("-k", "--samples-per-label", default=16, type=int)
    p.add_argument("--batch-size", default=None, type=int)
    p.add_argument("--eval-batch-size", default=64, type=int)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--eval-freq", default=2, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--lr", default=0.0001, type=float)
    p.add_argument("--margin", default=0.2, type=float)
    p.add_argument(
        "--loss-name", default=None,
        choices=["triplet", "triplet_hard", "weighted_multilabel_triplet",
                 "jaccard_supcon", "supcon", "dual_branch"],
    )
    p.add_argument("--supcon-temperature", default=0.07, type=float)
    p.add_argument("--dual-asl-alpha", default=1.0, type=float)
    p.add_argument("--asl-gamma-pos", default=1.0, type=float)
    p.add_argument("--asl-gamma-neg", default=4.0, type=float)
    p.add_argument("--asl-clip", default=0.05, type=float)
    p.add_argument("--print-freq", default=5, type=int)
    p.add_argument("--save-dir", default="./checkpoints")
    p.add_argument("--use-random-sampler", action="store_true")
    p.add_argument("--weight-decay", default=0.0, type=float)
    p.add_argument("--backbone-lr-scale", default=0.1, type=float)
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--use-mesh", action="store_true",
                   help="Shard batches over all local devices (data parallel)")
    p.add_argument("--fsdp", action="store_true",
                   help="With --use-mesh: also shard params + optimizer "
                        "state over the data axis (ZeRO-3; per-device "
                        "param/Adam memory scales 1/n_devices)")
    p.add_argument("--metrics-log", default="",
                   help="Append per-step/eval metrics as JSONL (observability)")
    p.add_argument("--cache-dir", default="",
                   help="Write-through decoded-image cache: epoch 1 decodes "
                        "at pipeline speed while filling the memmap as a "
                        "side effect; epochs 2+ serve at memcpy speed "
                        "(data/cache.py WriteThroughCache; the reference "
                        "re-decodes every epoch)")
    p.add_argument("--bf16", action="store_true", help="bf16 mixed precision (AMP equivalent: f32 master params, bf16 compute)")
    p.add_argument("--accum-steps", default=1, type=int,
                   help="Gradient accumulation: update params every N batches")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize the forward pass in backward "
                        "(gradient checkpointing)")
    p.add_argument("--ckpt-every", default=10, type=int,
                   help="Periodic checkpoint interval in epochs")
    p.add_argument("--eval-initial", action="store_true",
                   help="Eval the untrained model before epoch 1 (logged as "
                        "epoch 0) so the metrics log shows the full "
                        "learning curve")
    return p.parse_args(argv)


def _log_jsonl(path, record):
    import json

    with open(path, "a") as f:
        f.write(json.dumps(record, default=float) + "\n")


def select_loss(args) -> str:
    if args.loss_name:
        return args.loss_name
    from ..losses import auto_select_loss

    return auto_select_loss(args.dataset, args.model)


def main(argv=None):
    args = parse_args(argv)
    if args.fsdp and not args.use_mesh:
        raise SystemExit(
            "--fsdp shards params over the mesh data axis and requires "
            "--use-mesh; asked-for ZeRO-3 would otherwise be silently ignored"
        )
    np.random.seed(args.seed)

    train_ds = build_dataset(args, "train")
    try:
        val_ds = build_dataset(args, "val")
    except (FileNotFoundError, ValueError):
        val_ds = None
        print(">> no validation manifest found; skipping in-training eval")

    model, spec, variables = build_model(args, train=True)
    loss_name = select_loss(args)
    print(f">> model={args.model} loss={loss_name} dataset={args.dataset}")

    if args.cache_dir:
        from ..data.cache import WriteThroughCache

        train_ds = WriteThroughCache(
            train_ds, args.cache_dir, spec.resize_size,
            interpolation=getattr(spec, "interpolation", "bilinear"),
        )
        state_txt = "complete (memcpy-serve)" if train_ds.complete else (
            "filling (write-through during epoch 1)"
        )
        print(f">> decoded-image cache at {args.cache_dir}: {state_txt}")

    from ..data import PKSampler, batch_iterator, preprocess_for_spec
    from ..train import (
        build_optimizer,
        create_train_state,
        make_dual_branch_train_step,
        make_embedding_train_step,
    )
    from ..utils import BestCheckpointPolicy

    tx = build_optimizer(
        variables["params"],
        lr=args.lr,
        backbone_lr_scale=args.backbone_lr_scale,
        weight_decay=args.weight_decay,
        frozen_predicate=(lambda p: p.startswith("backbone"))
        if args.freeze_backbone
        else None,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), None, tx, variables=variables
    )
    if args.accum_steps > 1:
        from ..train import with_grad_accumulation

        state = with_grad_accumulation(state, args.accum_steps)
        print(f">> gradient accumulation over {args.accum_steps} microbatches")

    # Full-state resume: build_model already merged params/batch_stats; for
    # native checkpoints also restore opt_state/step/epoch so resume is exact
    # (closes the reference's restart-at-epoch-1 deficiency, train.py:767-778).
    start_epoch = 1
    if args.resume and not args.resume.endswith((".pt", ".pth")):
        from flax import serialization

        from ..utils import load_checkpoint

        loaded = load_checkpoint(args.resume)
        if isinstance(loaded, dict) and "opt_state" in loaded:
            try:
                state = state.replace(
                    opt_state=serialization.from_state_dict(
                        state.opt_state, loaded["opt_state"]
                    ),
                    step=jnp.asarray(loaded.get("step", 0), jnp.int32),
                )
                start_epoch = int(np.asarray(loaded.get("epoch", 0))) + 1
                print(f">> resumed optimizer state at step "
                      f"{int(state.step)}; continuing from epoch {start_epoch}")
            except (ValueError, KeyError) as exc:
                print(f">> opt_state in checkpoint does not match optimizer "
                      f"({exc}); resuming params only")

    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if loss_name == "dual_branch":
        step_fn = make_dual_branch_train_step(
            model,
            asl_alpha=args.dual_asl_alpha,
            temperature=args.supcon_temperature,
            gamma_pos=args.asl_gamma_pos,
            gamma_neg=args.asl_gamma_neg,
            clip=args.asl_clip,
            compute_dtype=compute_dtype,
        )
    else:
        kwargs = {}
        if loss_name in ("triplet", "triplet_hard"):
            kwargs["margin"] = args.margin
        elif loss_name == "weighted_multilabel_triplet":
            kwargs["margin"] = args.margin
        elif loss_name in ("supcon", "jaccard_supcon"):
            kwargs["temperature"] = args.supcon_temperature
        step_fn = make_embedding_train_step(
            model, loss_name, kwargs, compute_dtype=compute_dtype,
            remat=args.remat,
        )
    step = jax.jit(step_fn)

    mesh = None
    if args.use_mesh:
        from ..parallel import (
            batch_sharding, fsdp_state_shardings, make_mesh, replicated,
        )

        mesh = make_mesh()
        if args.fsdp:
            state = jax.device_put(state, fsdp_state_shardings(state, mesh))
            print(f">> FSDP (params+opt sharded) over {mesh.shape} mesh")
        else:
            state = jax.device_put(state, replicated(mesh))
            print(f">> data-parallel over {mesh.shape} mesh")

    batch_size = args.batch_size or args.labels_per_batch * args.samples_per_label
    multilabel = is_multilabel(args.dataset)

    name_kwargs = dict(
        dataset=args.dataset, model=args.model,
        embedding_dim=args.embedding_dim, anomaly=args.anomaly,
        rand_resize=args.rand_resize, seed=args.seed,
    )
    policy = BestCheckpointPolicy(
        args.save_dir, name_kwargs, periodic_every=args.ckpt_every
    )

    if args.eval_initial and val_ds is not None and start_epoch == 1:
        from ..data.pipeline import embed_dataset
        from ..metrics import train_eval_multilabel, train_eval_single_label

        embed = jitted_embed(model)
        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        embeds, labels = embed_dataset(
            val_ds, embed, eval_vars, spec,
            batch_size=args.eval_batch_size, num_workers=args.workers,
        )
        m = (
            train_eval_multilabel(embeds, labels)
            if multilabel
            else train_eval_single_label(embeds, labels)
        )
        print(f">> val (untrained): mAP={m['mAP']:.3f}% R@1={m['R@1']:.3f}%")
        if args.metrics_log:
            _log_jsonl(args.metrics_log, {
                "kind": "eval", "epoch": 0, "time": time.time(), **m,
            })

    for epoch in range(start_epoch, args.epochs + 1):
        # per-epoch rng derived from (seed, epoch), so resume-at-epoch-k
        # replays exactly the batches/augmentations of an uninterrupted run
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        if args.use_random_sampler:
            indices = np.random.permutation(len(train_ds)).tolist()
        elif multilabel:
            # label-aware batches (reference MultiLabelBalancedBatchSampler,
            # nih_multilabel_retrieval.py:351-411)
            from ..data import MultiLabelBalancedBatchSampler

            ml_sampler = MultiLabelBalancedBatchSampler(
                np.asarray(train_ds.labels), batch_size=batch_size,
                labels_per_batch=min(8, np.asarray(train_ds.labels).shape[1]),
                samples_per_label=4, seed=args.seed + epoch,
            )
            indices = [i for batch in ml_sampler for i in batch]
        else:
            sampler = PKSampler(
                list(train_ds.labels), args.labels_per_batch,
                args.samples_per_label, seed=args.seed + epoch,
            )
            indices = list(sampler)
        t0 = time.time()
        step_losses = []
        for i, (imgs, labs, _) in enumerate(
            batch_iterator(
                train_ds, batch_size, indices=indices,
                image_size=spec.resize_size, num_workers=args.workers,
                drop_last=True,
            )
        ):
            rng, krng = jax.random.split(rng)
            x = preprocess_for_spec(
                imgs, spec, train=True, rng=krng, rand_resize=args.rand_resize
            )
            labels = jnp.asarray(np.asarray(labs))
            if mesh is not None:
                from ..parallel import batch_sharding

                x = jax.device_put(x, batch_sharding(mesh))
                labels = jax.device_put(labels, batch_sharding(mesh))
            state, metrics = step(state, x, labels)
            if i % args.print_freq == 0:
                loss = float(metrics["loss"])
                # emergency halt on divergence (reference train.py:332-336);
                # checked on every fetched loss rather than every step to
                # avoid a per-step device sync
                if not np.isfinite(loss):
                    print(f"[ERROR] Non-finite loss at iter {i}, "
                          f"epoch {epoch}: {loss}")
                    raise ValueError(
                        "Training diverged: non-finite loss detected"
                    )
                step_losses.append(loss)
                print(f"epoch {epoch} step {i}: loss {loss:.4f}")
                if args.metrics_log:
                    _log_jsonl(args.metrics_log, {
                        "kind": "train", "epoch": epoch, "step": i,
                        "loss": loss, "time": time.time(),
                    })
        print(f">> epoch {epoch} done in {time.time() - t0:.1f}s")

        ckpt_tree = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step, "epoch": epoch,
        }
        ran_eval = val_ds is not None and epoch % args.eval_freq == 0
        if epoch % args.ckpt_every == 0 and not ran_eval:
            from ..utils import checkpoint_name, save_checkpoint

            save_checkpoint(
                os.path.join(
                    args.save_dir,
                    checkpoint_name(**name_kwargs, epoch=epoch, is_best=False),
                ),
                ckpt_tree,
                metadata={"epoch": epoch},
            )
        if ran_eval:
            from ..data.pipeline import embed_dataset
            from ..metrics import train_eval_multilabel, train_eval_single_label

            embed = jitted_embed(model)
            eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
            embeds, labels = embed_dataset(
                val_ds, embed, eval_vars, spec,
                batch_size=args.eval_batch_size, num_workers=args.workers,
            )
            m = (
                train_eval_multilabel(embeds, labels)
                if multilabel
                else train_eval_single_label(embeds, labels)
            )
            print(
                f">> val: mAP={m['mAP']:.3f}% R@1={m['R@1']:.3f}% "
                f"R@5={m['R@5']:.3f}% R@10={m['R@10']:.3f}%"
            )
            if args.metrics_log:
                _log_jsonl(args.metrics_log, {
                    "kind": "eval", "epoch": epoch, "time": time.time(), **m,
                })
            saved = policy.update(epoch, m["mAP"], ckpt_tree)
            if saved:
                print(f">> new best mAP {m['mAP']:.3f}% -> {saved}")

    print(f">> training complete; best mAP {policy.best_metric:.3f}% "
          f"(epoch {policy.best_epoch})")
    return policy.best_metric


if __name__ == "__main__":
    main()
