"""Offline dataset preprocessing (reference `segmentation/data/preprocess_*`).

Converts raw dataset downloads into the framework's on-disk layout:

    <DATA_PATH>/annotations/{split}/{img_id}.npy      (uint8 label ids)
    <DATA_PATH>/img_with_margin_{M}/{split}/{img_id}.png  (+ .npy mirror)
    <DATA_PATH>/all_images.json                       (split index)

Differences from the reference: image ``.npy`` mirrors are written in the
same pass (the reference requires a separate ``img_to_numpy`` run for
most datasets), and parallelism uses a process pool without argh/dotenv
dependencies.  Label conventions are identical:

- cityscapes: official ids -> 29-category index via the label-name table
  (ref preprocess_cityscapes.py:41-43); train-id conversion to 19 classes
  happens online in the dataset.
- pascal: raw SegmentationClassAug ids stored as-is (converted online).
- ade: ids stored as-is (already 0=void shifted in the release pngs).
- coco: COCO_ID_MAPPING applied offline (ref preprocess_coco.py).
- em: TIF stacks split into frames, EM_RGB_2_ID mapping, seeded random
  val split of EM_VAL_SIZE frames (ref preprocess_em.py:60-97).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.constants import (CITYSCAPES_CATEGORIES,
                                         CITYSCAPES_ID_2_LABEL, COCO_LUT,
                                         EM_RGB_2_ID, EM_VAL_SIZE,
                                         mapping_to_lut)

MARGIN_SIZE = 0


def add_margins_to_image(img: Image.Image, margin: int) -> Image.Image:
    """Mirror-pad a PIL image on all sides (ref utils.py:16-44)."""
    if margin == 0:
        return img
    arr = np.asarray(img)
    # PIL flip of the edge strip duplicates the edge pixel -> 'symmetric'
    arr = np.pad(arr, ((margin, margin), (margin, margin), (0, 0)),
                 mode="symmetric")
    return Image.fromarray(arr)


def _save_pair(image: Image.Image, label: Optional[np.ndarray],
               target: str, split: str, img_id: str, margin: int) -> None:
    ann_dir = os.path.join(target, "annotations", split)
    img_dir = os.path.join(target, f"img_with_margin_{margin}", split)
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    if label is not None:
        np.save(os.path.join(ann_dir, f"{img_id}.npy"),
                label.astype(np.uint8))
    img_m = add_margins_to_image(image, margin)
    img_m.save(os.path.join(img_dir, f"{img_id}.png"))
    np.save(os.path.join(img_dir, f"{img_id}.npy"),
            np.asarray(img_m, np.uint8))


def _write_index(target: str, img_ids: Dict[str, List[str]]) -> None:
    with open(os.path.join(target, "all_images.json"), "w") as f:
        json.dump(img_ids, f)


# ---------------------------------------------------------------------------
# Cityscapes
# ---------------------------------------------------------------------------
_CITY_CAT_LUT = None


def _city_lut() -> np.ndarray:
    global _CITY_CAT_LUT
    if _CITY_CAT_LUT is None:
        cat2idx = {c: i for i, c in enumerate(CITYSCAPES_CATEGORIES)}
        id2idx = {i: cat2idx[cat] for i, cat in
                  CITYSCAPES_ID_2_LABEL.items()}
        _CITY_CAT_LUT = mapping_to_lut(id2idx, 256)
    return _CITY_CAT_LUT


def _city_one(args):
    source, target, split, city, file = args
    img_id = file.split("_gtFine_labelIds.png")[0]
    label = np.asarray(Image.open(os.path.join(
        source, "gtFine", split, city, file)).convert("RGB"))[:, :, 0]
    label = _city_lut()[label]
    image = Image.open(os.path.join(
        source, "leftImg8bit", split, city,
        img_id + "_leftImg8bit.png")).convert("RGB")
    _save_pair(image, label, target, split, img_id, MARGIN_SIZE)
    return split, img_id


def preprocess_cityscapes(n_jobs: int = 8, source: Optional[str] = None,
                          target: Optional[str] = None) -> None:
    source = source or settings.source_data_path("cityscapes")
    target = target or settings.data_path("cityscapes")
    jobs = []
    for split in ("train", "val", "test"):
        split_dir = os.path.join(source, "gtFine", split)
        if not os.path.isdir(split_dir):
            continue
        for city in sorted(os.listdir(split_dir)):
            for file in sorted(os.listdir(os.path.join(split_dir, city))):
                if file.endswith("labelIds.png"):
                    jobs.append((source, target, split, city, file))
    img_ids: Dict[str, List[str]] = {"train": [], "val": [], "test": []}
    with ProcessPoolExecutor(max_workers=n_jobs) as pool:
        for split, img_id in pool.map(_city_one, jobs, chunksize=8):
            img_ids[split].append(img_id)
    _write_index(target, img_ids)
    print(f"cityscapes: {sum(map(len, img_ids.values()))} images")


# ---------------------------------------------------------------------------
# Pascal VOC-2012 (aug)
# ---------------------------------------------------------------------------
def _pascal_one(args):
    source, target, split, img_id = args
    label = None
    if split != "test":
        label = np.asarray(Image.open(os.path.join(
            source, "SegmentationClassAug", img_id + ".png"
        )).convert("RGB"))[:, :, 0]
    image = Image.open(os.path.join(
        source, "JPEGImages", img_id + ".jpg")).convert("RGB")
    _save_pair(image, label, target, split, img_id, MARGIN_SIZE)
    return split, img_id


def preprocess_pascal(n_jobs: int = 8, source: Optional[str] = None,
                      target: Optional[str] = None) -> None:
    source = source or settings.source_data_path("pascal")
    target = target or settings.data_path("pascal")
    split_dir = os.path.join(source, "ImageSets", "SegmentationAug")
    jobs, img_ids = [], {}
    for split in ("train_aug", "train", "val", "test"):
        list_file = os.path.join(split_dir, f"{split}.txt")
        if not os.path.exists(list_file):
            continue
        img_ids[split] = []
        with open(list_file) as f:
            for line in f:
                img_id = line.strip().split("/")[-1].split(".")[0]
                if img_id:
                    jobs.append((source, target, split, img_id))
    with ProcessPoolExecutor(max_workers=n_jobs) as pool:
        for split, img_id in pool.map(_pascal_one, jobs, chunksize=8):
            img_ids[split].append(img_id)
    _write_index(target, img_ids)
    print(f"pascal: {sum(map(len, img_ids.values()))} images")


# ---------------------------------------------------------------------------
# ADE20K (SceneParsing release)
# ---------------------------------------------------------------------------
def _ade_one(args):
    source, target, split, split_in, file = args
    img_id = file.split(".png")[0]
    label = np.asarray(Image.open(os.path.join(
        source, "annotations", split_in, file)).convert("RGB"))[:, :, 0]
    image = Image.open(os.path.join(
        source, "images", split_in, img_id + ".jpg")).convert("RGB")
    _save_pair(image, label, target, split, img_id, MARGIN_SIZE)
    return split, img_id


def preprocess_ade(n_jobs: int = 8, source: Optional[str] = None,
                   target: Optional[str] = None) -> None:
    source = source or settings.source_data_path("ade")
    target = target or settings.data_path("ade")
    jobs = []
    img_ids: Dict[str, List[str]] = {}
    for split, split_in in (("train", "training"), ("val", "validation")):
        ann_dir = os.path.join(source, "annotations", split_in)
        if not os.path.isdir(ann_dir):
            continue
        img_ids[split] = []
        for file in sorted(os.listdir(ann_dir)):
            if file.endswith(".png"):
                jobs.append((source, target, split, split_in, file))
    with ProcessPoolExecutor(max_workers=n_jobs) as pool:
        for split, img_id in pool.map(_ade_one, jobs, chunksize=8):
            img_ids[split].append(img_id)
    _write_index(target, img_ids)
    print(f"ade: {sum(map(len, img_ids.values()))} images")


# ---------------------------------------------------------------------------
# COCO-Stuff
# ---------------------------------------------------------------------------
def _coco_one(args):
    source, target, split, split_in, file = args
    img_id = file.split(".png")[0]
    label = np.asarray(Image.open(os.path.join(
        source, "annotations", split_in, file)).convert("L"))
    label = COCO_LUT[label]
    image = Image.open(os.path.join(
        source, "images", split_in, img_id + ".jpg")).convert("RGB")
    _save_pair(image, label, target, split, img_id, MARGIN_SIZE)
    return split, img_id


def preprocess_coco(n_jobs: int = 8, source: Optional[str] = None,
                    target: Optional[str] = None) -> None:
    source = source or settings.source_data_path("coco")
    target = target or settings.data_path("coco")
    jobs = []
    img_ids: Dict[str, List[str]] = {}
    for split, split_in in (("train", "train2017"), ("val", "val2017")):
        ann_dir = os.path.join(source, "annotations", split_in)
        if not os.path.isdir(ann_dir):
            continue
        img_ids[split] = []
        for file in sorted(os.listdir(ann_dir)):
            if file.endswith(".png"):
                jobs.append((source, target, split, split_in, file))
    with ProcessPoolExecutor(max_workers=n_jobs) as pool:
        for split, img_id in pool.map(_coco_one, jobs, chunksize=8):
            img_ids[split].append(img_id)
    _write_index(target, img_ids)
    print(f"coco: {sum(map(len, img_ids.values()))} images")


# ---------------------------------------------------------------------------
# EM / ISBI-2012
# ---------------------------------------------------------------------------
def preprocess_em(n_jobs: int = 1, seed: int = 42,
                  source: Optional[str] = None,
                  target: Optional[str] = None) -> None:
    source = source or settings.source_data_path("em")
    target = target or settings.data_path("em")
    images = Image.open(os.path.join(source, "train-volume.tif"))
    labels = Image.open(os.path.join(source, "train-labels.tif"))
    lut = mapping_to_lut(EM_RGB_2_ID, 256)

    np.random.seed(seed)
    val_ids = np.random.choice(images.n_frames, EM_VAL_SIZE,
                               replace=False).tolist()
    splits = {"train": [i for i in range(images.n_frames)
                        if i not in val_ids],
              "val": val_ids}
    img_ids: Dict[str, List[str]] = {"train": [], "val": []}
    for split, ids in splits.items():
        for i in ids:
            labels.seek(i)
            label = lut[np.asarray(labels.convert("L"))]
            images.seek(i)
            _save_pair(images.convert("RGB"), label, target, split,
                       str(i), MARGIN_SIZE)
            img_ids[split].append(str(i))
    _write_index(target, img_ids)
    print(f"em: {images.n_frames} frames (val={EM_VAL_SIZE})")


# ---------------------------------------------------------------------------
# PNG -> npy mirror (ref img_to_numpy.py)
# ---------------------------------------------------------------------------
def img_to_numpy(data_type: str, margin: int = 0,
                 target: Optional[str] = None) -> None:
    target = target or settings.data_path(data_type)
    base = os.path.join(target, f"img_with_margin_{margin}")
    for split in sorted(os.listdir(base)):
        split_dir = os.path.join(base, split)
        for file in sorted(os.listdir(split_dir)):
            if file.endswith(".png"):
                img = Image.open(os.path.join(split_dir, file)
                                 ).convert("RGB")
                np.save(os.path.join(split_dir, file[:-4] + ".npy"),
                        np.asarray(img, np.uint8))
