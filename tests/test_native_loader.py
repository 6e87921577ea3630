"""Native npy loader tests: parity with the Python reference path
(min-max normalize -> uint8 -> resize) and batch throughput sanity."""
import numpy as np
import pytest
from PIL import Image

from xmir_tpu.data import native_loader
from xmir_tpu.data.datasets import _to_uint8_image

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


def _python_path(arr, out_h, out_w):
    u8 = _to_uint8_image(arr)
    img = Image.fromarray(u8).convert("L").resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(img.convert("RGB"), np.uint8)


class TestNativeLoader:
    @pytest.mark.parametrize("dtype", [np.float32, np.float64, np.uint16, np.uint8])
    def test_matches_python_reference(self, tmp_path, rng, dtype):
        if dtype == np.uint8:
            arr = rng.integers(0, 255, (96, 128)).astype(dtype)
        else:
            arr = (rng.random((96, 128)) * 1000).astype(dtype)
        p = tmp_path / "img.npy"
        np.save(p, arr)
        native = native_loader.load_npy_image(str(p), 64, 64)
        ref = _python_path(arr, 64, 64)
        assert native.shape == (64, 64, 3)
        # bilinear implementations may differ by a few counts at edges
        diff = np.abs(native.astype(int) - ref.astype(int))
        assert np.median(diff) <= 1
        assert diff.mean() < 3

    def test_chw_layout(self, tmp_path, rng):
        arr = rng.random((1, 50, 60)).astype(np.float32)
        p = tmp_path / "chw.npy"
        np.save(p, arr)
        out = native_loader.load_npy_image(str(p), 32, 32)
        assert out.shape == (32, 32, 3)

    def test_batch_parallel(self, tmp_path, rng):
        paths = []
        for i in range(16):
            p = tmp_path / f"b{i}.npy"
            np.save(p, rng.random((40, 40)).astype(np.float32))
            paths.append(str(p))
        batch = native_loader.load_npy_batch(paths, 32, 32, n_threads=4)
        assert batch.shape == (16, 32, 32, 3)
        single = native_loader.load_npy_image(paths[3], 32, 32)
        np.testing.assert_array_equal(batch[3], single)

    def test_missing_file_fails_cleanly(self, tmp_path):
        with pytest.raises(ValueError):
            native_loader.load_npy_image(str(tmp_path / "nope.npy"), 8, 8)

    def test_constant_image(self, tmp_path):
        p = tmp_path / "const.npy"
        np.save(p, np.full((20, 20), 7.0, np.float32))
        out = native_loader.load_npy_image(str(p), 16, 16)
        assert (out == 0).all()  # max<=min -> zeros (read_data.py:86-87)


class TestNIHNativeIntegration:
    def test_dataset_batch_resized(self, tmp_path, rng):
        from xmir_tpu.data import NIHChestXrayRetrievalDataset

        for i in range(6):
            np.save(
                tmp_path / f"Chest_X-ray_Cardiomegaly_{i}.npy",
                rng.random((40, 50)).astype(np.float32),
            )
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        batch = ds.load_batch_resized(list(range(6)), 32, 32)
        assert batch.shape == (6, 32, 32, 3)
        one = ds.load_image_resized(2, 32, 32)
        np.testing.assert_array_equal(batch[2], one)

    def test_decode_batch_uses_native(self, tmp_path, rng):
        from xmir_tpu.data import NIHChestXrayRetrievalDataset
        from xmir_tpu.data.pipeline import _decode_batch

        np.save(
            tmp_path / "Chest_X-ray_Edema_0.npy",
            rng.random((64, 64)).astype(np.float32),
        )
        ds = NIHChestXrayRetrievalDataset(data_dir=str(tmp_path))
        imgs, labels, idxs = _decode_batch(ds, [0], 48)
        assert imgs.shape == (1, 48, 48, 3)
        assert labels.shape[0] == 1


class TestNativeLoaderRGB:
    """3-channel inputs: joint min-max normalize then PIL convert('L') luma
    (reference read_data.py:71-90,188), not channel 0."""

    @pytest.mark.parametrize("layout", ["hwc", "chw"])
    @pytest.mark.parametrize("dtype", [np.float32, np.uint8])
    def test_rgb_luma_matches_python(self, tmp_path, rng, dtype, layout):
        shape = (3, 60, 70) if layout == "chw" else (60, 70, 3)
        if dtype == np.uint8:
            arr = rng.integers(0, 255, shape).astype(np.uint8)
        else:
            arr = (rng.random(shape) * 7.0 - 3.0).astype(np.float32)
        p = tmp_path / f"rgb_{layout}.npy"
        np.save(p, arr)
        native = native_loader.load_npy_image(str(p), 48, 48)
        ref = _python_path(arr, 48, 48)
        diff = np.abs(native.astype(int) - ref.astype(int))
        assert np.median(diff) <= 1
        assert diff.mean() < 3

    def test_rgb_differs_from_channel0(self, tmp_path, rng):
        """Regression: a green-dominant image must not produce channel-0
        (red-only) grayscale."""
        arr = np.zeros((40, 40, 3), np.uint8)
        arr[..., 1] = 200  # green only
        p = tmp_path / "green.npy"
        np.save(p, arr)
        out = native_loader.load_npy_image(str(p), 40, 40)
        # PIL luma of (0, 200, 0) = 200*38470+0x8000 >> 16 = 117
        assert abs(int(out[20, 20, 0]) - 117) <= 1
