"""Decode-once uint8 cache: amortize host JPEG/PNG/npy decode across runs.

The host pipeline decodes + resizes every image on every pass (SURVEY §7
hard parts: host decode bottlenecks before the TPU does — measured 927 img/s
decode vs 6,706 img/s DenseNet embed on a 1-CPU host). For repeated passes
over a fixed gallery (ingest + eval + saliency sweeps), decode once into a
memory-mapped uint8 artifact and serve batches at page-cache/memcpy speed.

Artifact layout (directory):
  images.npy   (N, S, S, 3) uint8, memmap-friendly C-order
  meta.json    {"size": S, "n": N, "interpolation": ...}
  labels.npy   object/float array of dataset labels

Host-CPU sizing for the 10k img/s target (BASELINE.md): one worker decodes
~230 img/s of 256px npy (927/4 threads measured); cold decode therefore
needs ~44 cores for 10k img/s, while the cached path is pure sequential read
— ~50 MB/s per 1k img/s at 224px (0.15 MB/img), so a single NVMe/page-cache
stream feeds a v5e-8 comfortably.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Iterator, Optional

import numpy as np

from .pipeline import batch_iterator


def build_decoded_cache(
    dataset,
    cache_dir: str,
    image_size: int,
    *,
    batch_size: int = 64,
    num_workers: int = 8,
    interpolation: str = "bilinear",
) -> str:
    """Decode every item once (aspect-preserving resize+crop to
    `image_size`) into a memmapped uint8 artifact. Returns cache_dir."""
    os.makedirs(cache_dir, exist_ok=True)
    n = len(dataset)
    images = np.lib.format.open_memmap(
        os.path.join(cache_dir, "images.npy"),
        mode="w+", dtype=np.uint8, shape=(n, image_size, image_size, 3),
    )
    labels: list = [None] * n
    for imgs, labs, idxs in batch_iterator(
        dataset, batch_size, image_size=image_size, num_workers=num_workers,
        interpolation=interpolation,
    ):
        images[np.asarray(idxs)] = imgs
        for j, i in enumerate(np.asarray(idxs)):
            labels[int(i)] = labs[j]
    images.flush()
    np.save(os.path.join(cache_dir, "labels.npy"), np.asarray(labels))
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump(
            {"size": image_size, "n": n, "interpolation": interpolation}, f
        )
    return cache_dir


class WriteThroughCache:
    """Decode-on-first-use cache: epoch 1 runs at PIPELINE speed while the
    memmap fills as a side effect; epochs 2+ serve at memcpy speed.

    build_decoded_cache runs decode-then-train serially — the first epoch
    pays the full decode wall-time twice (once to build, once implicitly in
    page-cache misses). This wrapper instead presents the dataset duck-type
    batch_iterator expects (load_batch_cropped / load_image / labels) and
    writes every freshly-decoded batch back into the memmap from the decode
    worker threads, so cache building is fully overlapped with training
    (VERDICT r4 #7; the reference re-decodes every epoch, train.py:520-542).

    The artifact becomes a valid DecodedCache directory (meta.json written)
    the moment every index has been decoded once — by the samplers' natural
    coverage or by `finalize()`, which decodes any leftovers. A process that
    dies mid-build leaves images.npy without meta.json; the next run simply
    re-decodes on demand into the same file (writes are idempotent).
    """

    def __init__(
        self,
        dataset,
        cache_dir: str,
        image_size: int,
        *,
        interpolation: str = "bilinear",
    ):
        os.makedirs(cache_dir, exist_ok=True)
        self.dataset = dataset
        self.cache_dir = cache_dir
        self.size = int(image_size)
        self.interpolation = interpolation
        n = len(dataset)
        meta_path = os.path.join(cache_dir, "meta.json")
        img_path = os.path.join(cache_dir, "images.npy")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta["size"] != self.size or meta["n"] != n:
                raise ValueError(
                    f"existing cache is ({meta['n']}, {meta['size']}px), "
                    f"dataset needs ({n}, {self.size}px)"
                )
            self.images = np.load(img_path, mmap_mode="r+")
            self._done = np.ones(n, bool)
        else:
            self.images = np.lib.format.open_memmap(
                img_path, mode="w+", dtype=np.uint8,
                shape=(n, self.size, self.size, 3),
            )
            self._done = np.zeros(n, bool)
        self._n_done = int(self._done.sum())
        self._lock = threading.Lock()

    # ------------------------------------------------- dataset duck-type
    def __len__(self) -> int:
        return len(self.dataset)

    @property
    def labels(self):
        return self.dataset.labels

    @property
    def image_names(self):
        return getattr(self.dataset, "image_names", None)

    def load_image(self, index: int) -> np.ndarray:
        """Raw-image passthrough (callers needing original resolution)."""
        return self.dataset.load_image(index)

    def _decode_one(self, i: int) -> np.ndarray:
        from .transforms import pil_resize_center_crop

        arr = self.dataset.load_image(i)
        if arr.shape[:2] != (self.size, self.size):
            arr = pil_resize_center_crop(arr, self.size, self.interpolation)
        return arr

    def load_batch_cropped(self, indices, size: int, n_threads: int = 0):
        """The batch_iterator fast path: serve decoded rows from the memmap,
        decode+write-back the rest. Same decode semantics as the pipeline's
        per-item path (aspect-preserving resize + center crop)."""
        if size != self.size:
            raise ValueError(
                f"cache built at {self.size}px, requested {size}px"
            )
        idx = np.asarray(list(indices))
        out = np.empty((len(idx), self.size, self.size, 3), np.uint8)
        done = self._done[idx]
        if done.any():
            out[done] = self.images[idx[done]]
        missing = idx[~done]
        if missing.size:
            if hasattr(self.dataset, "load_batch_cropped"):
                try:
                    fresh = self.dataset.load_batch_cropped(
                        list(missing), self.size
                    )
                except ValueError:
                    fresh = np.stack([self._decode_one(i) for i in missing])
            else:
                fresh = np.stack([self._decode_one(i) for i in missing])
            out[~done] = fresh
            self.images[missing] = fresh  # write-back (idempotent per index)
            with self._lock:
                # recount rather than increment: sampled batches may repeat
                # an index (PKSampler), and counting a duplicate twice would
                # finalize the artifact before every image is decoded
                self._done[missing] = True
                self._n_done = int(self._done.sum())
                if self._n_done == len(self) and not os.path.exists(
                    os.path.join(self.cache_dir, "meta.json")
                ):
                    self._finalize_locked()
        return out

    def finalize(self):
        """Decode every not-yet-seen index and stamp the completed artifact."""
        missing = np.nonzero(~self._done)[0]
        for i in range(0, len(missing), 64):
            self.load_batch_cropped(missing[i : i + 64], self.size)
        with self._lock:
            if self._n_done == len(self) and not os.path.exists(
                os.path.join(self.cache_dir, "meta.json")
            ):
                self._finalize_locked()
        return self.cache_dir

    def _finalize_locked(self):
        self.images.flush()
        np.save(
            os.path.join(self.cache_dir, "labels.npy"),
            np.asarray(self.dataset.labels),
        )
        with open(os.path.join(self.cache_dir, "meta.json"), "w") as f:
            json.dump(
                {
                    "size": self.size,
                    "n": len(self),
                    "interpolation": self.interpolation,
                },
                f,
            )

    @property
    def complete(self) -> bool:
        return self._n_done == len(self)


class DecodedCache:
    """Serve a built cache with the dataset duck-type the pipeline expects
    (load_image / labels / batch fast path)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.images = np.load(
            os.path.join(cache_dir, "images.npy"), mmap_mode="r"
        )
        self.labels = np.load(
            os.path.join(cache_dir, "labels.npy"), allow_pickle=True
        )
        self.size = int(self.meta["size"])

    def __len__(self) -> int:
        return int(self.meta["n"])

    def load_image(self, index: int) -> np.ndarray:
        return np.asarray(self.images[index])

    def load_batch_cropped(self, indices, size: int, n_threads: int = 0):
        """Batch fast path: pure memmap gather (decode already done). Only
        valid at the cached size — the pipeline falls back per-item
        otherwise."""
        if size != self.size:
            raise ValueError(
                f"cache built at {self.size}px, requested {size}px"
            )
        return np.asarray(self.images[np.asarray(indices)])

    def iter_batches(
        self, batch_size: int, *, indices=None
    ) -> Iterator[tuple]:
        """Direct sequential batch iterator (no thread pool needed — the
        'decode' is a memcpy)."""
        idx = np.arange(len(self)) if indices is None else np.asarray(list(indices))
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            yield np.asarray(self.images[sel]), self.labels[sel], sel
