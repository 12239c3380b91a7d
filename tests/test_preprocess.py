"""Offline preprocessor tests on synthetic raw-dataset trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from scaleprotoseg_tpu.data.preprocess import (add_margins_to_image,
                                               img_to_numpy,
                                               preprocess_cityscapes,
                                               preprocess_em)


def test_preprocess_em_layout(tmp_path):
    source = tmp_path / "raw"
    target = tmp_path / "out"
    source.mkdir()
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(
        (rng.random((32, 32)) * 255).astype(np.uint8)) for _ in range(30)]
    labels = [Image.fromarray(
        rng.choice([0, 255], size=(32, 32)).astype(np.uint8))
        for _ in range(30)]
    frames[0].save(source / "train-volume.tif", save_all=True,
                   append_images=frames[1:])
    labels[0].save(source / "train-labels.tif", save_all=True,
                   append_images=labels[1:])

    preprocess_em(source=str(source), target=str(target))

    with open(target / "all_images.json") as f:
        index = json.load(f)
    assert len(index["val"]) == 10 and len(index["train"]) == 20
    assert not set(index["val"]) & set(index["train"])
    img_id = index["train"][0]
    ann = np.load(target / "annotations" / "train" / f"{img_id}.npy")
    assert set(np.unique(ann)) <= {1, 2}  # EM_RGB_2_ID: 0->1, 255->2
    img = np.load(target / "img_with_margin_0" / "train" / f"{img_id}.npy")
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert (target / "img_with_margin_0" / "train" / f"{img_id}.png"
            ).exists()


def test_preprocess_cityscapes_category_conversion(tmp_path):
    source = tmp_path / "raw"
    target = tmp_path / "out"
    city_dir = source / "gtFine" / "val" / "testcity"
    img_dir = source / "leftImg8bit" / "val" / "testcity"
    city_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    # official ids: 7=road, 26=car, 0=void
    label = np.zeros((16, 16), np.uint8)
    label[:8] = 7
    label[8:] = 26
    label[0, 0] = 0
    Image.fromarray(label).save(
        city_dir / "frame_000001_gtFine_labelIds.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        img_dir / "frame_000001_leftImg8bit.png")

    preprocess_cityscapes(n_jobs=1, source=str(source), target=str(target))

    ann = np.load(target / "annotations" / "val" / "frame_000001.npy")
    # category indices: road -> 1, car -> 20 (pos in CITYSCAPES_CATEGORIES)
    assert ann[0, 0] == 0
    assert ann[4, 4] == 1
    assert ann[12, 12] == 20
    with open(target / "all_images.json") as f:
        assert json.load(f)["val"] == ["frame_000001"]


def test_cityscapes_offline_online_conversion_chain(tmp_path):
    """Official ids -> (offline) category index -> (online) 19-class train
    ids: the two-stage chain must match the reference's end-to-end mapping
    (road 7 -> cat 1 -> train id 1; car 26 -> cat 20 -> 18+1=19? no:
    CITYSCAPES_19_EVAL_CATEGORIES[20] = 14 -> stored 14 = car train id 13+1)."""
    source = tmp_path / "raw"
    target = tmp_path / "out"
    city_dir = source / "gtFine" / "val" / "c"
    img_dir = source / "leftImg8bit" / "val" / "c"
    city_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    label = np.zeros((16, 16), np.uint8)
    label[:, :4] = 7     # road     -> train id 0 (stored 1)
    label[:, 4:8] = 26   # car      -> train id 13 (stored 14)
    label[:, 8:12] = 23  # sky      -> train id 10 (stored 11)
    label[:, 12:] = 4    # static   -> void (stored 0)
    Image.fromarray(label).save(city_dir / "f_gtFine_labelIds.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        img_dir / "f_leftImg8bit.png")
    preprocess_cityscapes(n_jobs=1, source=str(source), target=str(target))

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    ds = PatchClassificationDataset(
        split_key="val", is_eval=True, data_type="cityscapes",
        mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
        image_margin_size=0, window_size=(16, 16), scales=(1.0,),
        only_19_from_cityscapes=True, root=str(target), native=False)
    import random
    random.seed(0)
    _, lab = ds[0]
    got = {int(v) for v in np.unique(lab)}
    assert got == {1, 14, 11, 0}, got
    # native path produces the same chain
    try:
        ds_n = PatchClassificationDataset(
            split_key="val", is_eval=True, data_type="cityscapes",
            mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
            image_margin_size=0, window_size=(16, 16), scales=(1.0,),
            only_19_from_cityscapes=True, root=str(target), native=True)
        random.seed(0)
        _, lab_n = ds_n[0]
        np.testing.assert_array_equal(lab_n, lab)
    except RuntimeError:
        pass  # no compiler available


def test_add_margins_mirrors(tmp_path):
    img = Image.fromarray(
        np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
    out = add_margins_to_image(img, 4)
    arr = np.asarray(out)
    assert arr.shape == (24, 24, 3)
    src = np.asarray(img)
    # PIL-style mirrored margin duplicates the edge pixel ('symmetric'):
    # margin row m-1 equals source row 0
    np.testing.assert_array_equal(arr[3], arr[4])
    np.testing.assert_array_equal(arr[2], arr[5])
    np.testing.assert_array_equal(arr[4:20, 4:20], src)
