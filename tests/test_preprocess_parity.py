"""Preprocessing parity: aspect-preserving host decode + per-spec
interpolation vs an independently-written torchvision-semantics oracle.

torchvision's PIL backend implements Resize(int)/CenterCrop as exactly the
PIL calls reproduced in the oracle below (_compute_resized_output_size with
int() truncation; crop offset int(round((n-s)/2))); reference eval
transforms: test.py:1330-1333 (224 path), test.py:1297-1306 (DINOv2 via timm
config, bicubic), nih_multilabel_retrieval.py:48-61 (NIH val).
"""
import numpy as np
import pytest
from PIL import Image

from xmir_tpu.data.pipeline import _decode_batch
from xmir_tpu.data.transforms import (
    eval_preprocess,
    pil_resize_center_crop,
)


def _tv_oracle(arr, resize, crop, resample=Image.BILINEAR):
    """Independent torchvision Resize(int)+CenterCrop oracle."""
    img = Image.fromarray(arr)
    w, h = img.size
    short, long = (h, w) if h <= w else (w, h)
    new_short, new_long = resize, int(resize * long / short)
    nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
    img = img.resize((nw, nh), resample)
    top = int(round((nh - crop) / 2.0))
    left = int(round((nw - crop) / 2.0))
    return np.asarray(img.crop((left, top, left + crop, top + crop)), np.uint8)


class _FakeDataset:
    def __init__(self, images):
        self.images = images
        self.labels = list(range(len(images)))

    def __len__(self):
        return len(self.images)

    def load_image(self, i):
        return self.images[i]


@pytest.fixture
def nonsquare(rng):
    # landscape and portrait, sizes with ragged resize ratios
    return [
        rng.integers(0, 255, (300, 437, 3)).astype(np.uint8),
        rng.integers(0, 255, (411, 250, 3)).astype(np.uint8),
    ]


class TestHostDecode:
    def test_decode_batch_matches_torchvision_oracle(self, nonsquare):
        ds = _FakeDataset(nonsquare)
        imgs, labels, idxs = _decode_batch(ds, [0, 1], 256)
        assert imgs.shape == (2, 256, 256, 3)
        for k in range(2):
            oracle = _tv_oracle(nonsquare[k], 256, 256)
            np.testing.assert_array_equal(imgs[k], oracle)

    def test_bicubic_interpolation_flows_through(self, nonsquare):
        ds = _FakeDataset(nonsquare)
        imgs, _, _ = _decode_batch(ds, [0], 256, interpolation="bicubic")
        oracle = _tv_oracle(nonsquare[0], 256, 256, Image.BICUBIC)
        np.testing.assert_array_equal(imgs[0], oracle)
        bil, _, _ = _decode_batch(ds, [0], 256)
        assert np.abs(bil[0].astype(int) - imgs[0].astype(int)).max() > 0

    def test_square_source_passthrough_unchanged(self, rng):
        img = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
        ds = _FakeDataset([img])
        imgs, _, _ = _decode_batch(ds, [0], 256)
        np.testing.assert_array_equal(imgs[0], img)


class TestFullChain:
    def test_host_plus_device_equals_reference_transform(self, nonsquare):
        """host decode(256) -> device eval_preprocess(256->224) must equal
        the reference 224 eval transform: Resize(256)+CenterCrop(224)+
        ToTensor+Normalize (test.py:1330-1333)."""
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        ds = _FakeDataset(nonsquare)
        imgs, _, _ = _decode_batch(ds, [0, 1], 256)
        got = np.asarray(eval_preprocess(imgs, 256, 224, mean, std))

        for k in range(2):
            ref_u8 = _tv_oracle(nonsquare[k], 256, 224)
            want = (ref_u8.astype(np.float32) / 255.0 - mean) / std
            np.testing.assert_allclose(got[k], want, atol=2e-5)

    def test_dinov2_spec_bicubic_and_no_crop(self):
        from xmir_tpu.models.registry import get_spec

        spec = get_spec("dinov2")
        assert spec.interpolation == "bicubic"
        assert spec.resize_size == spec.input_size == 518

    def test_preprocess_for_spec_uses_interpolation(self, rng):
        from xmir_tpu.data.transforms import preprocess_for_spec
        from xmir_tpu.models.registry import get_spec

        # feed a batch LARGER than resize_size so the device resize is real
        batch = rng.integers(0, 255, (1, 300, 300, 3)).astype(np.uint8)
        spec224 = get_spec("densenet121")
        out = np.asarray(preprocess_for_spec(batch, spec224))
        assert out.shape == (1, 224, 224, 3)


class TestNativeCrop:
    def test_native_crop_matches_pil_oracle(self, tmp_path, rng):
        from xmir_tpu.data import native_loader
        from xmir_tpu.data.datasets import _to_uint8_image

        if not native_loader.available():
            pytest.skip("native loader not built")
        arr = (rng.random((80, 123)) * 900).astype(np.float32)
        p = tmp_path / "img.npy"
        np.save(p, arr)
        native = native_loader.load_npy_image_crop(str(p), 48)
        assert native.shape == (48, 48, 3)
        gray = np.asarray(Image.fromarray(_to_uint8_image(arr)).convert("L"))
        ref = _tv_oracle(gray, 48, 48)
        diff = np.abs(native[..., 0].astype(int) - ref.astype(int))
        assert np.median(diff) <= 1
        assert diff.mean() < 3

    def test_dataset_batch_cropped(self, tmp_path, rng):
        from xmir_tpu.data import NIHChestXrayRetrievalDataset

        for i in range(4):
            np.save(
                tmp_path / f"Chest_X-ray_Cardiomegaly_{i}.npy",
                rng.random((40, 64)).astype(np.float32),
            )
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        batch = ds.load_batch_cropped(list(range(4)), 32)
        assert batch.shape == (4, 32, 32, 3)
        one = ds.load_image_cropped(2, 32)
        np.testing.assert_array_equal(batch[2], one)

    def test_decode_batch_nih_is_aspect_preserving(self, tmp_path, rng):
        """The pipeline's native fast path must now center-crop, not squash:
        a wide gradient image keeps its center, not its squashed edges."""
        from xmir_tpu.data import NIHChestXrayRetrievalDataset
        from xmir_tpu.data.datasets import _to_uint8_image

        arr = np.tile(np.linspace(0, 900, 96, dtype=np.float32), (32, 1))
        np.save(tmp_path / "Chest_X-ray_Edema_0.npy", arr)
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        imgs, _, _ = _decode_batch(ds, [0], 32)
        gray = np.asarray(Image.fromarray(_to_uint8_image(arr)).convert("L"))
        ref = _tv_oracle(gray, 32, 32)
        diff = np.abs(imgs[0][..., 0].astype(int) - ref.astype(int))
        assert diff.mean() < 3
