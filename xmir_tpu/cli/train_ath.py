"""ATH deep-hashing trainer CLI (reference train_ath.py:1-444): online
(anchor, positive, negative) triplet sampling + TripletHashLoss + cross
entropy on the type head."""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_dataset_args, build_dataset


def sample_triplets(labels: np.ndarray, batch: int, rng: np.random.Generator):
    """Online triplet index sampling (reference OnlineTripletDataset,
    train_ath.py:25-66): per anchor pick a same-class positive and a
    different-class negative."""
    labels = np.asarray(labels)
    n = len(labels)
    anchors = rng.integers(0, n, batch)
    pos, neg = [], []
    for a in anchors:
        same = np.nonzero(labels == labels[a])[0]
        diff = np.nonzero(labels != labels[a])[0]
        pos.append(int(rng.choice(same)))
        neg.append(int(rng.choice(diff)))
    return anchors, np.asarray(pos), np.asarray(neg)


def main(argv=None):
    p = argparse.ArgumentParser(description="xmir-tpu ATH hashing trainer")
    add_dataset_args(p)
    p.add_argument("--hash-size", default=48, type=int)
    p.add_argument("--num-classes", default=3, type=int)
    p.add_argument("--image-size", default=256, type=int)
    p.add_argument("--batch-size", default=32, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--steps-per-epoch", default=100, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--margin", default=0.5, type=float)
    p.add_argument("--ce-weight", default=1.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--save", default="./checkpoints/ath.msgpack")
    args = p.parse_args(argv)

    import optax

    from ..data.pipeline import _decode_batch
    from ..data.transforms import normalize
    from ..losses import triplet_hash_loss
    from ..models import ATHEmbedder
    from ..train import create_train_state
    from ..utils import save_checkpoint

    ds = build_dataset(args, "train")
    labels = np.asarray(ds.labels)
    model = ATHEmbedder(args.hash_size, args.num_classes, args.image_size)
    x0 = jnp.zeros((args.batch_size * 3, args.image_size, args.image_size, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.PRNGKey(args.seed), x0
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(args.lr))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), None, tx,
                               variables=variables)

    def step_fn(state, images, type_labels):
        b = args.batch_size

        def losses(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            out, updates = model.apply(vs, images, train=True,
                                       mutable=["batch_stats"])
            codes, logits = out["hash_codes"], out["logits"]
            hash_loss = triplet_hash_loss(
                codes[:b], codes[b : 2 * b], codes[2 * b :], args.margin
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:b], type_labels
            ).mean()
            return hash_loss + args.ce_weight * ce, (
                hash_loss, ce, updates["batch_stats"]
            )

        (loss, (hl, ce, new_stats)), grads = jax.value_and_grad(
            losses, has_aux=True
        )(state.params)
        return state.apply_gradients(grads, new_stats), {
            "loss": loss, "hash": hl, "ce": ce,
        }

    step = jax.jit(step_fn)
    rng = np.random.default_rng(args.seed)
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        last = {}
        for _ in range(args.steps_per_epoch):
            a, pos, neg = sample_triplets(labels, args.batch_size, rng)
            idxs = np.concatenate([a, pos, neg])
            imgs, _, _ = _decode_batch(ds, idxs.tolist(), args.image_size)
            x = normalize(jnp.asarray(imgs), (0.485, 0.456, 0.406),
                          (0.229, 0.224, 0.225))
            state, last = step(state, x, jnp.asarray(labels[a]))
        print(f"epoch {epoch}: loss {float(last['loss']):.4f} "
              f"(hash {float(last['hash']):.4f}, ce {float(last['ce']):.4f}) "
              f"in {time.time() - t0:.1f}s")
    save_checkpoint(args.save, {"params": state.params,
                                "batch_stats": state.batch_stats})
    print(f">> saved {args.save}")


if __name__ == "__main__":
    main()
