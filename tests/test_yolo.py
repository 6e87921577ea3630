"""YOLOv5 detector tower + ultralytics-.pt converter, golden-tested against
a random-init torch oracle built with ultralytics v6.0 module/layout
semantics (the reference's detector folds are ONNX exports of this lineage,
ChestMIR/utils/inference.py:290-340)."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # torch-oracle suites: second tier, see conftest


torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xmir_tpu.models.convert import convert_yolov5  # noqa: E402
from xmir_tpu.models.yolo import DEFAULT_ANCHORS, STRIDES, YOLOv5, make_divisible  # noqa: E402

NC = 14
DM, WM = 0.33, 0.25  # tiny width for test speed (yolov5n-ish)


def _w(c):
    return make_divisible(c * WM, 8)


def _d(n):
    return max(round(n * DM), 1)


# ---------------- torch oracle (ultralytics v6.0 module semantics) --------


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c1, c2, 1, 1)
        self.cv2 = TConv(c2, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TBottleneck(c_, c_, shortcut) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = tnn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.nc, self.no, self.na = nc, nc + 5, 3
        self.m = tnn.ModuleList(tnn.Conv2d(c, self.na * self.no, 1) for c in ch)
        anchors = torch.tensor(DEFAULT_ANCHORS, dtype=torch.float32)
        strides = torch.tensor(STRIDES, dtype=torch.float32).view(3, 1, 1)
        self.register_buffer("anchors", anchors / strides)

    def forward(self, feats):
        outs = []
        for i, x in enumerate(feats):
            b, _, ny, nx = x.shape
            p = self.m[i](x).view(b, self.na, self.no, ny, nx).permute(0, 1, 3, 4, 2)
            y = p.sigmoid()
            yv, xv = torch.meshgrid(
                torch.arange(ny), torch.arange(nx), indexing="ij"
            )
            grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float() - 0.5
            anchor_grid = (self.anchors[i] * STRIDES[i]).view(1, self.na, 1, 1, 2)
            xy = (y[..., 0:2] * 2 + grid) * STRIDES[i]
            wh = (y[..., 2:4] * 2) ** 2 * anchor_grid
            outs.append(
                torch.cat((xy, wh, y[..., 4:]), -1).view(b, -1, self.no)
            )
        return torch.cat(outs, 1)


class TYOLO(tnn.Module):
    """ultralytics-layout root: children registered as model.{i} so the
    state_dict keys match real checkpoints."""

    def __init__(self, nc=NC):
        super().__init__()
        layers = [
            TConv(3, _w(64), 6, 2, 2),            # 0
            TConv(_w(64), _w(128), 3, 2),         # 1
            TC3(_w(128), _w(128), _d(3)),         # 2
            TConv(_w(128), _w(256), 3, 2),        # 3
            TC3(_w(256), _w(256), _d(6)),         # 4
            TConv(_w(256), _w(512), 3, 2),        # 5
            TC3(_w(512), _w(512), _d(9)),         # 6
            TConv(_w(512), _w(1024), 3, 2),       # 7
            TC3(_w(1024), _w(1024), _d(3)),       # 8
            TSPPF(_w(1024), _w(1024)),            # 9
            TConv(_w(1024), _w(512), 1, 1),       # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 11
            tnn.Identity(),                       # 12 concat
            TC3(_w(1024), _w(512), _d(3), False), # 13
            TConv(_w(512), _w(256), 1, 1),        # 14
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 15
            tnn.Identity(),                       # 16 concat
            TC3(_w(512), _w(256), _d(3), False),  # 17
            TConv(_w(256), _w(256), 3, 2),        # 18
            tnn.Identity(),                       # 19 concat
            TC3(_w(512), _w(512), _d(3), False),  # 20
            TConv(_w(512), _w(512), 3, 2),        # 21
            tnn.Identity(),                       # 22 concat
            TC3(_w(1024), _w(1024), _d(3), False),# 23
            TDetect(nc, (_w(256), _w(512), _w(1024))),      # 24
        ]
        self.model = tnn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        x = m[0](x); x = m[1](x); x = m[2](x); x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4); x = m[8](x); x = m[9](x)
        t10 = m[10](x)
        x = torch.cat((m[11](t10), p4), 1)
        x = m[13](x)
        t14 = m[14](x)
        x = torch.cat((m[15](t14), p3), 1)
        o17 = m[17](x)
        x = torch.cat((m[18](o17), t14), 1)
        o20 = m[20](x)
        x = torch.cat((m[21](o20), t10), 1)
        o23 = m[23](x)
        return m[24]((o17, o20, o23))


class TestYOLOConverter:
    @pytest.fixture(scope="class")
    def oracle(self):
        torch.manual_seed(0)
        t = TYOLO().eval()
        # randomize BN stats so converter mistakes can't hide behind 0/1
        with torch.no_grad():
            for mod in t.modules():
                if isinstance(mod, tnn.BatchNorm2d):
                    mod.running_mean.uniform_(-0.5, 0.5)
                    mod.running_var.uniform_(0.5, 1.5)
        return t

    def test_prediction_matches_torch_oracle(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        variables, anchors = convert_yolov5(sd, depth_multiple=DM)
        model = YOLOv5(num_classes=NC, depth_multiple=DM, width_multiple=WM,
                       anchors=anchors)

        rng = np.random.default_rng(0)
        x = rng.random((1, 3, 128, 128)).astype(np.float32)
        with torch.no_grad():
            want = oracle(torch.from_numpy(x)).numpy()

        x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        got = np.asarray(
            model.apply(variables, x_j, train=False)["prediction"]
        )
        assert got.shape == want.shape  # (1, N, 5+nc), same row order
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_detector_fn_drives_decode_pipeline(self, oracle, tmp_path):
        """Converted checkpoint -> detector_fn -> run_detector: the
        end-to-end ChestMIR detector path from a real .pt artifact."""
        from xmir_tpu.chestmir.inference import run_detector
        from xmir_tpu.chestmir.lesions import detector_fn_from_checkpoint

        path = str(tmp_path / "fold0.pt")
        torch.save(oracle.state_dict(), path)
        fn = detector_fn_from_checkpoint(
            path, num_classes=NC, depth_multiple=DM, width_multiple=WM
        )
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (150, 120, 3)).astype(np.uint8)
        boxes, scores, classes = run_detector(
            fn, img, 128, conf_thres=0.001, iou_thres=0.5
        )
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert len(scores) == len(classes) == len(boxes)

    def test_anchor_buffer_roundtrip(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        _, anchors = convert_yolov5(sd, depth_multiple=DM)
        np.testing.assert_allclose(
            np.asarray(anchors), np.asarray(DEFAULT_ANCHORS), rtol=1e-6
        )
