"""YOLOv5-style lesion detector tower in Flax (NHWC).

The reference runs its 14-class VinDr lesion detector as 5 ONNX folds
(ChestMIR/utils/inference.py:290-340 create_session) exported from
ultralytics-YOLOv5-lineage torch checkpoints. ONNX is not available in this
environment, so this module re-implements the v6.0 YOLOv5 graph natively —
CSP backbone (Conv/C3/SPPF), PAN neck, 3-scale anchor Detect head — and
models/convert.py:convert_yolov5 maps an ultralytics ``.pt`` state_dict onto
it, giving ``detector_fn`` a real-checkpoint path end-to-end
(chestmir/inference.py consumes the decoded (1, N, 5+nc) output).

Exact semantics mirrored from ultralytics v6.0 modules:
  Conv   = Conv2d(bias=False, autopad) + BatchNorm(eps=1e-3) + SiLU
  C3     = cv3(cat(bottlenecks(cv1(x)), cv2(x))), bottleneck e=1.0
  SPPF   = cv2(cat(x, mp(x), mp2(x), mp3(x))), maxpool k=5 s=1 p=2
  Detect = sigmoid -> xy=(2y+grid-1)*stride/2-form, wh=(2y)^2*anchor,
           concatenated over scales to (B, N, 5+nc)
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# default COCO-lineage anchors in PIXELS per stride-8/16/32 scale
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


class ConvBnSiLU(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    p: int = -1  # -1 -> autopad k//2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2 if self.p < 0 else self.p
        x = nn.Conv(
            self.out, (self.k, self.k), (self.s, self.s),
            padding=[(pad, pad), (pad, pad)], use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, momentum=0.97,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    e: float = 1.0  # C3 bottlenecks use e=1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out * self.e)
        y = ConvBnSiLU(hidden, 1, 1, name="cv1")(x, train)
        y = ConvBnSiLU(self.out, 3, 1, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out:
            y = x + y
        return y


class C3(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out * self.e)
        a = ConvBnSiLU(hidden, 1, 1, name="cv1")(x, train)
        b = ConvBnSiLU(hidden, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, name=f"m{i}")(a, train)
        return ConvBnSiLU(self.out, 1, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class SPPF(nn.Module):
    out: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnSiLU(hidden, 1, 1, name="cv1")(x, train)
        pad = self.k // 2
        mp = lambda t: nn.max_pool(
            t, (self.k, self.k), (1, 1), [(pad, pad), (pad, pad)]
        )
        y1 = mp(x)
        y2 = mp(y1)
        y3 = mp(y2)
        return ConvBnSiLU(self.out, 1, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


class YOLOv5(nn.Module):
    """v6.0 graph. Param names follow the ultralytics layer indices
    (layer{i}) so the converter maps 1:1 onto ``model.{i}.*`` keys."""

    num_classes: int = 14
    depth_multiple: float = 0.33  # yolov5s
    width_multiple: float = 0.50
    anchors: Tuple = DEFAULT_ANCHORS

    def _w(self, c: int) -> int:
        return make_divisible(c * self.width_multiple, 8)

    def _d(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1)

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = True):
        """x: (B, S, S, 3) float32 in [0, 1]. Returns dict with per-scale
        raw maps and (when decode) the (B, N, 5+nc) prediction tensor the
        reference's ONNX sessions emit (inference.py:318-327)."""
        w, d = self._w, self._d
        # backbone
        x = ConvBnSiLU(w(64), 6, 2, 2, name="layer0")(x, train)
        x = ConvBnSiLU(w(128), 3, 2, name="layer1")(x, train)
        x = C3(w(128), d(3), name="layer2")(x, train)
        x = ConvBnSiLU(w(256), 3, 2, name="layer3")(x, train)
        p3 = C3(w(256), d(6), name="layer4")(x, train)
        x = ConvBnSiLU(w(512), 3, 2, name="layer5")(p3, train)
        p4 = C3(w(512), d(9), name="layer6")(x, train)
        x = ConvBnSiLU(w(1024), 3, 2, name="layer7")(p4, train)
        x = C3(w(1024), d(3), name="layer8")(x, train)
        x = SPPF(w(1024), name="layer9")(x, train)
        # PAN neck
        t10 = ConvBnSiLU(w(512), 1, 1, name="layer10")(x, train)
        x = jnp.concatenate([_upsample2(t10), p4], axis=-1)
        x = C3(w(512), d(3), shortcut=False, name="layer13")(x, train)
        t14 = ConvBnSiLU(w(256), 1, 1, name="layer14")(x, train)
        x = jnp.concatenate([_upsample2(t14), p3], axis=-1)
        o17 = C3(w(256), d(3), shortcut=False, name="layer17")(x, train)
        x = ConvBnSiLU(w(256), 3, 2, name="layer18")(o17, train)
        x = jnp.concatenate([x, t14], axis=-1)
        o20 = C3(w(512), d(3), shortcut=False, name="layer20")(x, train)
        x = ConvBnSiLU(w(512), 3, 2, name="layer21")(o20, train)
        x = jnp.concatenate([x, t10], axis=-1)
        o23 = C3(w(1024), d(3), shortcut=False, name="layer23")(x, train)

        # Detect head: one 1x1 biased conv per scale
        na = len(self.anchors[0])
        no = 5 + self.num_classes
        maps = []
        for i, feat in enumerate((o17, o20, o23)):
            maps.append(
                nn.Conv(na * no, (1, 1), name=f"detect{i}")(feat)
            )
        out = {"maps": maps}
        if decode:
            out["prediction"] = self.decode_maps(maps)
        return out

    def decode_maps(self, maps: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """ultralytics v6 inference decode (yolo.py Detect.forward):
        y = sigmoid(p); xy = (2y + grid - 0.5) * stride;
        wh = (2y)^2 * anchor_px; concatenated to (B, N, 5+nc)."""
        na = len(self.anchors[0])
        no = 5 + self.num_classes
        outs = []
        for i, p in enumerate(maps):
            b, ny, nx, _ = p.shape
            stride = STRIDES[i]
            p = p.reshape(b, ny, nx, na, no)
            y = nn.sigmoid(p.astype(jnp.float32))
            gx, gy = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny))
            grid = jnp.stack([gx, gy], axis=-1).astype(jnp.float32) - 0.5
            anchor = jnp.asarray(self.anchors[i], jnp.float32)  # (na, 2) px
            xy = (y[..., 0:2] * 2.0 + grid[:, :, None, :]) * stride
            wh = (y[..., 2:4] * 2.0) ** 2 * anchor[None, None, :, :]
            rest = y[..., 4:]
            dec = jnp.concatenate([xy, wh, rest], axis=-1)  # (b, ny, nx, na, no)
            # ultralytics flattens anchor-major: (b, na, ny, nx, no) -> rows
            dec = jnp.transpose(dec, (0, 3, 1, 2, 4)).reshape(b, -1, no)
            outs.append(dec)
        return jnp.concatenate(outs, axis=1)
