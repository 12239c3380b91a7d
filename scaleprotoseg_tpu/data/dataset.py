"""Training dataset with reference-parity augmentation.

Host-side numpy pipeline mirroring `segmentation/data/dataset.py:34-198`:
pre-converted ``.npy`` images/labels from the offline preprocessors, ID
conversion via dense LUTs, and the exact train-time augmentation order —
uniform random scale, cv2-bilinear image / PIL-nearest label resize,
mean/zero padding, random crop to the window, horizontal flip, /255 +
Normalize (optional color jitter).  Batches come out NHWC float32
(TPU-native layout; the reference emits CHW).

The heavy lifting (resize) runs in cv2/numpy which release the GIL, so
the threaded prefetch loader overlaps input with TPU compute.
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional, Tuple

import cv2
import numpy as np
from PIL import Image

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.configlib import REQUIRED, configurable
from scaleprotoseg_tpu.constants import convert_targets


def resize_label(label: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """PIL-NEAREST label resize (ref dataset.py:22-30); size=(W, H)."""
    out = Image.fromarray(label.astype(float)).resize(
        size, resample=Image.NEAREST)
    return np.asarray(out, dtype=np.int64)


@configurable(allowlist=["data_type", "mean", "std", "image_margin_size",
                         "window_size", "scales", "jitter",
                         "only_19_from_cityscapes", "det_seed"])
class PatchClassificationDataset:
    """Map-style dataset yielding (image NHWC float32, label int32)."""

    def __init__(
        self,
        split_key: str,
        is_eval: bool,
        push_prototypes: bool = False,
        data_type: str = REQUIRED,
        mean: List[float] = REQUIRED,
        std: List[float] = REQUIRED,
        image_margin_size: int = REQUIRED,
        window_size: Optional[Tuple[int, int]] = None,
        only_19_from_cityscapes: bool = False,
        scales: Tuple[float, ...] = (1.0,),
        jitter: bool = False,
        root: Optional[str] = None,
        native: object = "auto",
        det_seed: Optional[int] = None,
    ):
        self.split_key = split_key
        self.is_eval = is_eval
        self.push_prototypes = push_prototypes
        self.data_type = data_type
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.image_margin_size = image_margin_size
        self.window_size = tuple(window_size) if window_size else None
        self.scales = tuple(scales)
        self.jitter = jitter
        self.only_19 = only_19_from_cityscapes
        # Deterministic-augmentation mode: when set, every sample's
        # randomness comes from hash((det_seed, epoch, index)) instead of
        # the process-global `random` stream, so item contents are
        # independent of loader thread scheduling — the property exact
        # mid-phase resume and bit-reproducible runs need.  Default off:
        # the global stream matches the reference's DataLoader-worker
        # nondeterminism (`segmentation/data/data_module.py:35-55`).
        self.det_seed = det_seed
        self.epoch = 0

        root = root or settings.data_path(data_type)
        self.root = root
        self.annotations_dir = os.path.join(root, "annotations", split_key)
        self.img_dir = os.path.join(
            root, f"img_with_margin_{image_margin_size}", split_key)
        with open(os.path.join(root, "all_images.json")) as fp:
            self.img_ids = json.load(fp)[split_key]
        self.img_id2idx = {img_id: i for i, img_id in
                           enumerate(self.img_ids)}

        # native fused-augmentation fast path (C++ kernel); the numpy
        # pipeline remains the reference and the fallback
        self._use_native = False
        if native in (True, "auto") and \
                os.environ.get("SPS_NATIVE_AUG", "1") != "0":
            try:
                from scaleprotoseg_tpu import native as native_mod
                self._use_native = native_mod.native_available()
            except Exception:
                self._use_native = False
            if native is True and not self._use_native:
                raise RuntimeError("native augmentation requested but "
                                   "the fastaug library failed to build")

    def __len__(self) -> int:
        return len(self.img_ids)

    def set_epoch(self, epoch: int) -> None:
        """Advance the deterministic-augmentation stream (loader calls
        this once per epoch; a no-op unless ``det_seed`` is set)."""
        self.epoch = int(epoch)

    def get_img_path(self, img_id: str) -> str:
        return os.path.join(self.img_dir, img_id + ".png")

    def _load_raw(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        img_id = self.img_ids[index]
        image = np.load(os.path.join(self.img_dir, img_id + ".npy"))
        label = np.load(os.path.join(self.annotations_dir, img_id + ".npy"))
        return image.astype(np.uint8), label

    def convert(self, label: np.ndarray) -> np.ndarray:
        if label.ndim == 3:
            label = label[:, :, 0]
        return convert_targets(label, self.data_type).astype(np.int32)

    def _color_jitter(self, image: np.ndarray, r=random) -> np.ndarray:
        """Torchvision-style ColorJitter(0.2, 0.2, 0.2, 0.2) on [0,1] HWC."""
        b = r.uniform(0.8, 1.2)
        c = r.uniform(0.8, 1.2)
        s = r.uniform(0.8, 1.2)
        h = r.uniform(-0.2, 0.2)
        image = np.clip(image * b, 0, 1)
        gray = image.mean(axis=-1, keepdims=True)
        image = np.clip((image - gray.mean()) * c + gray.mean(), 0, 1)
        image = np.clip((image - gray) * s + gray, 0, 1)
        hsv = cv2.cvtColor(image.astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        image, label = self._load_raw(index)
        if label.ndim == 3:
            label = label[:, :, 0]
        window = self.window_size or label.shape[:2]

        if self.image_margin_size:
            m = self.image_margin_size
            image = image[m:-m, m:-m]

        # draw all augmentation randomness up front (same order/stream as
        # the pure-python pipeline so both paths are seed-compatible);
        # det_seed swaps the process-global stream for a per-(epoch,
        # index) one, making items thread-schedule-independent
        r = random if self.det_seed is None else \
            random.Random(f"{self.det_seed}/{self.epoch}/{index}")
        in_h, in_w = label.shape
        scale = 1.0 if len(self.scales) < 2 else \
            r.uniform(self.scales[0], self.scales[1])
        rs_h, rs_w = int(in_h * scale), int(in_w * scale)
        pad_h = max(window[0] - rs_h, 0)
        pad_w = max(window[1] - rs_w, 0)
        start_h = r.randint(0, rs_h + pad_h - window[0])
        start_w = r.randint(0, rs_w + pad_w - window[1])
        flip = r.random() < 0.5
        use_jitter = self.jitter and not self.is_eval and \
            not self.push_prototypes

        if self._use_native and not use_jitter:
            from scaleprotoseg_tpu import native
            from scaleprotoseg_tpu.constants import conversion_lut
            out_img, out_label = native.fastaug(
                image, label, conversion_lut(self.data_type), scale,
                window, (start_h, start_w), flip, self.mean, self.std,
                normalize=not self.push_prototypes)
            return out_img, out_label

        return self._python_aug(image, self.convert(label), window, scale,
                                (rs_h, rs_w), (start_h, start_w), flip,
                                use_jitter, r)

    def _python_aug(self, image, label, window, scale, resized, start,
                    flip, use_jitter, r=random):
        """Reference-parity numpy/cv2 pipeline (ref dataset.py:116-198)."""
        rs_h, rs_w = resized
        image = cv2.resize(image, (rs_w, rs_h),
                           interpolation=cv2.INTER_LINEAR)
        label = resize_label(label, (rs_w, rs_h))
        image = image.astype(np.float32) / 255.0

        # pad bottom/right to window (ref :159-171)
        pad_h = max(window[0] - rs_h, 0)
        pad_w = max(window[1] - rs_w, 0)
        if pad_h or pad_w:
            image = cv2.copyMakeBorder(
                image, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT,
                value=tuple(float(v) for v in self.mean))
            label = cv2.copyMakeBorder(
                label.astype(np.int32), 0, pad_h, 0, pad_w,
                cv2.BORDER_CONSTANT, value=0)

        start_h, start_w = start
        image = image[start_h:start_h + window[0],
                      start_w:start_w + window[1]]
        label = label[start_h:start_h + window[0],
                      start_w:start_w + window[1]]

        if flip:
            image = np.ascontiguousarray(image[:, ::-1])
            label = np.ascontiguousarray(label[:, ::-1])

        if not self.push_prototypes:
            if use_jitter:
                image = self._color_jitter(image, r)
            image = (image - self.mean) / self.std

        return image.astype(np.float32), label.astype(np.int32)
