"""Transform-zoo tests: torch-oracle parity of the numpy transforms vs the
reference video_transforms.py (and torch F.interpolate for resize), plus
the DatasetFromCSV transform pipeline."""

import numpy as np
import pytest

from viditq_tpu.data import transforms as T
from viditq_tpu.data.datasets import DatasetFromCSV

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ref_models import load_video_transforms_module  # noqa: E402

ref_vt = load_video_transforms_module()


def _clip(shape=(3, 2, 17, 23), seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


@pytest.mark.parametrize("size", [(32, 16), (9, 7), (17, 23), (8, 24)])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_resize_matches_torch_interpolate(size, mode):
    x = _clip()
    got = T.resize(x, size, mode)
    want = F.interpolate(torch.from_numpy(x), size=size, mode=mode,
                         **({"align_corners": False}
                            if mode == "bilinear" else {})).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_scale_matches_reference():
    x = _clip((2, 3, 20, 31))
    got = T.resize_scale(x, (12, 12))
    want = ref_vt.resize_scale(torch.from_numpy(x), (12, 12),
                               "bilinear").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_functional_parity():
    x = _clip((4, 3, 19, 11))
    tx = torch.from_numpy(x)
    np.testing.assert_array_equal(T.crop(x, 2, 3, 8, 5),
                                  ref_vt.crop(tx, 2, 3, 8, 5).numpy())
    np.testing.assert_array_equal(
        T.center_crop(x, (10, 8)), ref_vt.center_crop(tx, (10, 8)).numpy())
    np.testing.assert_array_equal(
        T.center_crop_using_short_edge(x),
        ref_vt.center_crop_using_short_edge(tx).numpy())
    np.testing.assert_array_equal(T.hflip(x), ref_vt.hflip(tx).numpy())

    raw = np.random.default_rng(1).integers(0, 255, (4, 19, 11, 3),
                                            np.uint8)
    # reference to_tensor takes TCHW uint8 (read_video layout); ours takes
    # the raw THWC decode and permutes
    got = T.to_tensor(raw)
    want = ref_vt.to_tensor(
        torch.from_numpy(raw.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # normalize matches the factory's transforms.Normalize (TCHW
    # per-channel; the in-file CTHW `normalize` is unused by the pipeline,
    # reference datasets.py:20)
    clip = T.to_tensor(raw)
    got_n = T.normalize_video(clip, [0.5, 0.4, 0.3], [0.5, 0.2, 0.1])
    mean = torch.tensor([0.5, 0.4, 0.3])[:, None, None]
    std = torch.tensor([0.5, 0.2, 0.1])[:, None, None]
    want_n = ((torch.from_numpy(clip) - mean) / std).numpy()
    np.testing.assert_allclose(got_n, want_n, rtol=1e-6, atol=1e-6)


def test_deterministic_classes_parity():
    x = _clip((3, 3, 40, 28))
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(
        T.UCFCenterCropVideo(16)(x),
        ref_vt.UCFCenterCropVideo(16)(tx).numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        T.CenterCropResizeVideo(16)(x),
        ref_vt.CenterCropResizeVideo(16)(tx).numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        T.CenterCropVideo((20, 12))(x),
        ref_vt.CenterCropVideo((20, 12))(tx).numpy())


class _FixedRng:
    """Generator stand-in with scripted draws."""

    def __init__(self, random_val=0.9, ints=(0,)):
        self._r = random_val
        self._ints = list(ints)

    def random(self):
        return self._r

    def integers(self, lo, hi):
        return self._ints.pop(0) if self._ints else lo


def test_get_transforms_video_parity_no_flip():
    raw = np.random.default_rng(2).integers(0, 255, (5, 48, 36, 3),
                                            np.uint8)
    got = T.get_transforms_video(16, rng=_FixedRng(random_val=0.9))(raw)
    # reference pipeline (datasets.py:14-23) without the flip branch
    t_in = torch.from_numpy(raw.transpose(0, 3, 1, 2))
    want = ref_vt.to_tensor(t_in)
    want = ref_vt.UCFCenterCropVideo(16)(want)
    mean = torch.tensor([0.5, 0.5, 0.5])[:, None, None]
    want = ((want - mean) / mean).numpy()
    assert got.shape == (5, 3, 16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_random_classes_shapes_and_bounds():
    rng = np.random.default_rng(3)
    x = _clip((2, 3, 30, 50))
    out = T.RandomCropVideo((8, 9), rng=rng)(x)
    assert out.shape == (2, 3, 8, 9)
    out = T.KineticsRandomCropResizeVideo(16, rng=rng)(x)
    assert out.shape == (2, 3, 16, 16)
    out = T.random_shift_crop(x, rng)
    assert out.shape == (2, 3, 30, 30)
    for total in (3, 10, 100):
        b, e = T.TemporalRandomCrop(8, rng=rng)(total)
        assert 0 <= b <= e <= total
        assert e - b == min(8, total - b)


def test_center_crop_arr_shape():
    img = np.random.default_rng(4).integers(0, 255, (137, 251, 3), np.uint8)
    out = T.center_crop_arr(img, 32)
    assert out.shape == (32, 32, 3)


def test_dataset_with_transform_pipeline(tmp_path):
    frames = np.random.default_rng(5).integers(0, 255, (9, 24, 18, 3),
                                               np.uint8)
    vid = tmp_path / "clip.npz"
    np.savez(vid, video=frames)
    csv_path = tmp_path / "data.csv"
    csv_path.write_text(f"{vid},a clip\n")
    ds = DatasetFromCSV(
        str(csv_path), num_frames=4,
        transform=T.get_transforms_video(8, rng=_FixedRng()),
        temporal_sample=T.TemporalRandomCrop(4, rng=_FixedRng(ints=(2,))))
    item = ds[0]
    assert item["video"].shape == (3, 4, 8, 8)   # CTHW
    assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0
    assert item["text"] == "a clip"


def test_image_transform_pipeline(tmp_path):
    from PIL import Image
    img = np.random.default_rng(6).integers(0, 255, (40, 52, 3), np.uint8)
    p = tmp_path / "im.png"
    Image.fromarray(img).save(p)
    csv_path = tmp_path / "d.csv"
    csv_path.write_text(f"{p},a pic\n")
    ds = DatasetFromCSV(str(csv_path),
                        transform=T.get_transforms_image(16, _FixedRng()))
    item = ds[0]
    assert item["video"].shape == (3, 1, 16, 16)
