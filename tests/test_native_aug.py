"""Native fused-augmentation kernel vs the numpy reference pipeline."""

import os

import numpy as np
import pytest

from scaleprotoseg_tpu import native
from scaleprotoseg_tpu.constants import conversion_lut
from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
from e2e_utils import build_synthetic_dataset

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="g++ unavailable")


def _make_ds(root, **kw):
    return PatchClassificationDataset(
        split_key="train", is_eval=False, data_type="em",
        mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
        image_margin_size=0, window_size=(24, 24), scales=(0.7, 1.3),
        root=root, **kw)


def test_native_matches_python_pipeline(tmp_path, rng):
    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=3,
                                   n_val=1)
    ds_native = _make_ds(root, native=True)
    ds_python = _make_ds(root, native=False)
    assert ds_native._use_native and not ds_python._use_native

    import random
    for idx in range(3):
        for seed in (0, 1, 2):
            random.seed(seed)
            img_n, lab_n = ds_native[idx]
            random.seed(seed)
            img_p, lab_p = ds_python[idx]
            assert img_n.shape == img_p.shape == (24, 24, 3)
            # labels are exact (nearest + LUT are integer ops)
            np.testing.assert_array_equal(lab_n, lab_p)
            # image: float bilinear vs cv2's 11-bit fixed-point bilinear
            # (~0.25/255 mean deviation on the normalized scale)
            np.testing.assert_allclose(img_n, img_p, atol=2.5e-2)
            assert np.abs(img_n - img_p).mean() < 8e-3


def test_native_push_mode_no_normalization(tmp_path):
    root = build_synthetic_dataset(str(tmp_path / "d2"), n_train=2,
                                   n_val=1)
    ds = PatchClassificationDataset(
        split_key="train", is_eval=True, push_prototypes=True,
        data_type="em", mean=[0.485, 0.456, 0.406],
        std=[0.229, 0.224, 0.225], image_margin_size=0,
        window_size=(24, 24), scales=(1.0,), root=root, native=True)
    img, lab = ds[0]
    assert 0.0 <= img.min() and img.max() <= 1.0  # un-normalized [0,1]


def test_fastaug_identity_scale_no_flip(rng):
    image = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    label = rng.integers(0, 3, (16, 16)).astype(np.uint8)
    lut = np.arange(256, dtype=np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out_img, out_lab = native.fastaug(
        image, label, lut, 1.0, (16, 16), (0, 0), False, mean, std, True)
    np.testing.assert_array_equal(out_lab, label)
    np.testing.assert_allclose(out_img, image.astype(np.float32) / 255,
                               atol=1e-6)
