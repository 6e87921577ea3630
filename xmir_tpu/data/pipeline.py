"""Host-side input pipeline: parallel decode workers + device prefetch.

The reference leans on torch DataLoader workers; here a thread pool decodes
images to uint8 batches while the TPU runs the previous step, and
`prefetch_to_device` keeps a small queue of device-resident batches. Decode
stays on host; resize/normalize run on device (data/transforms.py), so host
work is only file IO + PIL decode.
"""
from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np


def _decode_batch(dataset, indices: Sequence[int], image_size: Optional[int],
                  skip_errors: bool = False, interpolation: str = "bilinear"):
    from .transforms import pil_resize_center_crop

    if image_size is not None and hasattr(dataset, "load_batch_cropped"):
        # native C++ batch path (NIH .npy fast path) — aspect-preserving
        # Resize(short=image_size)+CenterCrop(image_size), matching the
        # reference eval transforms (nih_multilabel_retrieval.py:48-61)
        try:
            imgs_arr = dataset.load_batch_cropped(list(indices), image_size)
            labels = np.asarray([dataset.labels[i] for i in indices])
            return imgs_arr, labels, np.asarray(indices)
        except ValueError:
            if not skip_errors:
                raise
            # fall through to the per-item path so bad files can be skipped

    imgs, kept = [], []
    for i in indices:
        try:
            arr = dataset.load_image(i)
        except Exception as e:
            if not skip_errors:
                raise
            # skip-corrupt-image robustness (reference
            # ingest_embeddings.py:293-302)
            print(f">> skipping unreadable item {i}: {type(e).__name__}")
            continue
        if image_size is not None and arr.shape[:2] != (image_size, image_size):
            # aspect-preserving short-side resize + center crop (torchvision
            # Resize(int)+CenterCrop semantics, test.py:1330-1333) — NOT a
            # square squash, which distorted non-square sources
            arr = pil_resize_center_crop(arr, image_size, interpolation)
        imgs.append(arr)
        kept.append(i)
    if not imgs:
        return (
            np.zeros((0,) + ((image_size, image_size, 3) if image_size else (1, 1, 3)),
                     np.uint8),
            np.zeros((0,)),
            np.zeros((0,), np.int64),
        )
    labels = np.asarray([dataset.labels[i] for i in kept])
    return np.stack(imgs), labels, np.asarray(kept)


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    indices: Optional[Iterable[int]] = None,
    image_size: Optional[int] = None,
    num_workers: int = 8,
    drop_last: bool = False,
    skip_errors: bool = False,
    interpolation: str = "bilinear",
) -> Iterator[tuple]:
    """Yield (uint8 images (B, S, S, 3), labels, indices) with parallel decode.

    `indices` may be any index stream (e.g. PKSampler). `image_size` is the
    HOST decode size — pick >= the model's resize_size so device-side resize
    only ever downsamples.
    """
    if indices is None:
        indices = range(len(dataset))
    idx_list = list(indices)
    batches: List[List[int]] = [
        idx_list[i : i + batch_size] for i in range(0, len(idx_list), batch_size)
    ]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()
    if not batches:
        return
    # Bounded in-flight window (~2x workers): decoded uint8 batches otherwise
    # accumulate unboundedly when the consumer is slower than the decoders —
    # a 100k-image ingest would hold GBs of decoded images on the host.
    window = max(2 * num_workers, 2)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = deque(
            pool.submit(
                _decode_batch, dataset, b, image_size, skip_errors, interpolation
            )
            for b in batches[:window]
        )
        next_batch = window
        while pending:
            fut = pending.popleft()
            imgs, labels, idxs = fut.result()
            if next_batch < len(batches):
                pending.append(
                    pool.submit(
                        _decode_batch, dataset, batches[next_batch],
                        image_size, skip_errors, interpolation,
                    )
                )
                next_batch += 1
            if imgs.shape[0] == 0:
                continue
            yield imgs, labels, idxs


def prefetch_to_device(iterator: Iterator, size: int = 2) -> Iterator:
    """Stage host batches onto the device ahead of consumption."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.tree_util.tree_map(jax.device_put, item))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


def embed_dataset(
    dataset,
    embed_fn,
    variables,
    spec,
    batch_size: int = 64,
    num_workers: int = 8,
    skip_errors: bool = False,
    mesh=None,
):
    """Embed every item: the test.py/ingest hot loop (test.py:1070-1078,
    ingest_embeddings.py:278-316). Pads the tail batch for one compiled shape.

    With a mesh, batches shard over the `data` axis (the reference's
    DDP-sharded eval + dist.all_gather of embeddings, train.py:600-609 — the
    gather is just reading the sharded output).

    Returns (embeddings (N, D) float32 np, labels np array).
    """
    from .transforms import eval_preprocess

    if mesh is not None:
        import jax as _jax
        from jax.sharding import PartitionSpec as _P

        from ..parallel import DATA_AXIS, batch_sharding

        sharding = batch_sharding(mesh)
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data  # divisible batches
        # shard_map (Manual partitioning) rather than plain jit: each device
        # runs embed_fn on its LOCAL batch shard, so Pallas kernels inside
        # the model (window attention, fused MLP) execute per-device instead
        # of forcing GSPMD to all-gather around an unpartitionable custom
        # call
        embed_fn = _jax.jit(
            _jax.shard_map(
                embed_fn,
                mesh=mesh,
                in_specs=(_P(), _P(DATA_AXIS)),
                out_specs=_P(DATA_AXIS),
                check_vma=False,
            )
        )

    host_size = spec.resize_size
    method = getattr(spec, "interpolation", "bilinear")
    embeds, labels = [], []
    for imgs, labs, idxs in batch_iterator(
        dataset, batch_size, image_size=host_size, num_workers=num_workers,
        skip_errors=skip_errors, interpolation=method,
    ):
        real = imgs.shape[0]
        if real < batch_size:
            pad = batch_size - real
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        x = eval_preprocess(
            imgs, spec.resize_size, spec.input_size, spec.mean, spec.std,
            method=method,
        )
        if mesh is not None:
            import jax as _jax

            x = _jax.device_put(x, sharding)
        e = embed_fn(variables, x)
        embeds.append(np.asarray(e[:real]))
        labels.extend(np.asarray(labs).tolist())
    return np.concatenate(embeds, axis=0), np.asarray(labels)
