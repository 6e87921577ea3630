"""End-to-end converted-weight parity across the two stacks.

The same synthetic NON-SQUARE image batch flows through
  (a) the torch stack: torchvision-semantics PIL transforms
      (Resize(256)+CenterCrop(224)+Normalize, reference test.py:1330-1333)
      + a torchvision-layout torch DenseNet121 (random init, randomized BN
      stats) -> pooled embeddings, and
  (b) the xmir stack: the real host decode (_decode_batch) + device
      eval_preprocess + convert_densenet121-converted weights ->
      DenseNetBackbone pooled embeddings,
and must produce matching embeddings, identical nearest neighbours, and
identical retrieval metrics (R@K / mAP / majority-vote P@K). This chains
the independently-pinned pieces — transform oracle (test_preprocess_parity),
converter oracle (test_convert), reference-computed metric goldens
(test_reference_parity) — into one cross-stack proof on real non-square
data. Reference flow: test.py:1122-1126 evaluate() over test.py:1330-1333
transforms with CheXNet-style DenseNet121 embeddings.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from xmir_tpu.data.pipeline import _decode_batch
from xmir_tpu.data.transforms import eval_preprocess
from xmir_tpu.models import DenseNetBackbone
from xmir_tpu.models.convert import convert_densenet121
from xmir_tpu.metrics.retrieval import (
    compute_classification_metrics,
    fill_diagonal_neg_inf,
    retrieval_recall_at_k,
)

from test_convert import _TorchDenseNet

pytestmark = pytest.mark.heavy  # full-depth DenseNet121 on CPU

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _synthetic_images(n=16, seed=11):
    """Non-square uint8 RGB images with class-correlated structure."""
    rng = np.random.default_rng(seed)
    sizes = [(288, 256), (256, 320), (300, 268), (272, 352)]
    imgs, labels = [], []
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        c = i % 3
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = [
            128 + 90 * np.sin(yy / 31.0),
            128 + 90 * np.sin(xx / 23.0),
            128 + 90 * np.sin((xx + yy) / 41.0),
        ][c]
        arr = base[..., None] + rng.normal(0, 28, (h, w, 3))
        imgs.append(np.clip(arr, 0, 255).astype(np.uint8))
        labels.append(c)
    return imgs, np.asarray(labels, np.int64)


class _ListDataset:
    def __init__(self, imgs, labels):
        self._imgs = imgs
        self.labels = list(labels)

    def __len__(self):
        return len(self._imgs)

    def load_image(self, i):
        return self._imgs[i]


def _tv_oracle(arr, resize, crop):
    """Independent torchvision Resize(int)+CenterCrop semantics via PIL
    (same oracle construction as test_preprocess_parity)."""
    from PIL import Image

    img = Image.fromarray(arr)
    w, h = img.size
    short, long = (h, w) if h <= w else (w, h)
    new_short, new_long = resize, int(resize * long / short)
    nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
    img = img.resize((nw, nh), Image.BILINEAR)
    top = int(round((nh - crop) / 2.0))
    left = int(round((nw - crop) / 2.0))
    return np.asarray(img.crop((left, top, left + crop, top + crop)), np.uint8)


def _l2(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestEndToEndConvertedWeights:
    def test_cross_stack_embeddings_neighbours_metrics(self):
        imgs, labels = _synthetic_images()

        # shared random-init torch model (randomized BN stats: eval-mode
        # normalization must be non-trivial, as in test_convert)
        torch.manual_seed(3)
        tm = _TorchDenseNet().eval()
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}

        # --- (a) torch stack ---
        t_in = np.stack([_tv_oracle(a, 256, 224) for a in imgs])
        t_in = ((t_in.astype(np.float32) / 255.0 - MEAN) / STD).astype(np.float32)
        with torch.no_grad():
            _, t_pool = tm(torch.tensor(t_in.transpose(0, 3, 1, 2)))
        t_emb = _l2(t_pool.numpy())

        # --- (b) xmir stack: host decode -> device preprocess -> converted ---
        ds = _ListDataset(imgs, labels)
        u8, got_labels, _ = _decode_batch(ds, list(range(len(imgs))), 256)
        np.testing.assert_array_equal(got_labels, labels)
        x = eval_preprocess(u8, 256, 224, MEAN, STD)
        variables = convert_densenet121(sd)
        out = DenseNetBackbone().apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        x_emb = _l2(np.asarray(out["pooled"]))

        # embeddings match to converter-oracle precision on unit vectors
        np.testing.assert_allclose(x_emb, t_emb, atol=2e-3)

        # identical retrieval: same neighbour ranking, same metrics
        def sims(e):
            return np.asarray(
                fill_diagonal_neg_inf(jnp.asarray(e @ e.T, jnp.float32))
            )

        s_t, s_x = sims(t_emb), sims(x_emb)
        order_t = np.argsort(-s_t, axis=1)[:, :10]
        order_x = np.argsort(-s_x, axis=1)[:, :10]
        np.testing.assert_array_equal(order_x, order_t)

        r_t = retrieval_recall_at_k(s_t, labels, topk=(1, 5, 10))
        r_x = retrieval_recall_at_k(s_x, labels, topk=(1, 5, 10))
        assert r_x == r_t

        m_t = compute_classification_metrics(labels, s_t, k_values=(1, 5, 10))
        m_x = compute_classification_metrics(labels, s_x, k_values=(1, 5, 10))

        def assert_tree_equal(a, b, path=""):
            if isinstance(a, dict):
                assert a.keys() == b.keys(), path
                for key in a:
                    assert_tree_equal(a[key], b[key], f"{path}.{key}")
            else:
                np.testing.assert_allclose(
                    b, a, rtol=0, atol=0, err_msg=f"metric {path} diverged"
                )

        assert_tree_equal(m_t, m_x)


class TestEndToEndViTConvertedWeights:
    def test_cross_stack_vit_bicubic(self):
        """Same chain for the ViT/DINOv2 family: non-square sources through
        PIL BICUBIC Resize(short)+CenterCrop (the timm DINOv2 eval config,
        reference test.py:1297-1306) + a timm-layout torch ViT vs the xmir
        host decode (interpolation="bicubic") + convert_vit_timm weights ->
        ViTBackbone cls embeddings. Pins the round-3 aspect-preserving /
        per-spec-interpolation decode against a second backbone family and
        the LayerNorm tower converter."""
        from PIL import Image

        from xmir_tpu.models.convert import convert_vit_timm
        from xmir_tpu.models.vit import ViTBackbone
        from test_convert_convnext_vit import _TorchViT

        imgs, labels = _synthetic_images(n=12, seed=5)
        torch.manual_seed(7)
        tm = _TorchViT(img=28, patch=14, dim=32, depth=2, heads=4).eval()
        # timm's LayerScale init (1e-5) leaves a random 2-block tower's cls
        # output input-INDEPENDENT (every image embeds identically, making
        # neighbour order meaningless); set the scales to 1 so the blocks
        # actually mix image content, as trained checkpoints do
        with torch.no_grad():
            for blk in tm.blocks:
                blk.ls1.gamma.fill_(1.0)
                blk.ls2.gamma.fill_(1.0)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        def tv_bicubic(arr, size):
            img = Image.fromarray(arr)
            w, h = img.size
            short, long = (h, w) if h <= w else (w, h)
            new_short, new_long = size, int(size * long / short)
            nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
            img = img.resize((nw, nh), Image.BICUBIC)
            top = int(round((nh - size) / 2.0))
            left = int(round((nw - size) / 2.0))
            return np.asarray(
                img.crop((left, top, left + size, top + size)), np.uint8
            )

        t_in = np.stack([tv_bicubic(a, 28) for a in imgs])
        t_norm = ((t_in.astype(np.float32) / 255.0 - MEAN) / STD).astype(np.float32)
        with torch.no_grad():
            t_cls, _ = tm(torch.tensor(t_norm.transpose(0, 3, 1, 2)))
        t_emb = _l2(t_cls.numpy())

        ds = _ListDataset(imgs, labels)
        u8, got_labels, _ = _decode_batch(
            ds, list(range(len(imgs))), 28, interpolation="bicubic"
        )
        np.testing.assert_array_equal(got_labels, labels)
        # host already produced the 28x28 crop; the device resize is a no-op
        x = eval_preprocess(u8, 28, 28, MEAN, STD, method="bicubic")
        variables = convert_vit_timm(sd, depth=2)
        out = ViTBackbone(
            img_size=28, patch_size=14, dim=32, depth=2, num_heads=4
        ).apply(variables, jnp.asarray(x))
        x_emb = _l2(np.asarray(out["cls"]))

        # measured cross-stack agreement: host decode EXACTLY equals the
        # PIL bicubic oracle (uint8-identical), embeddings to ~5e-7
        np.testing.assert_allclose(x_emb, t_emb, atol=1e-4)

        def sims(e):
            return np.asarray(
                fill_diagonal_neg_inf(jnp.asarray(e @ e.T, jnp.float32))
            )

        order_t = np.argsort(-sims(t_emb), axis=1)[:, :5]
        order_x = np.argsort(-sims(x_emb), axis=1)[:, :5]
        np.testing.assert_array_equal(order_x, order_t)
