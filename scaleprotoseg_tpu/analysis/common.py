"""Shared helpers for the interpretability analysis scripts."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.constants import (
    CITYSCAPES_19_EVAL_CATEGORIES, CITYSCAPES_CATEGORIES, IMAGENET_MEAN,
    IMAGENET_STD, MAX_PARTS_CITY, MAX_PARTS_PASCAL, PASCAL_CATEGORIES,
    PASCAL_FILTER_CLASS, PASCAL_ID_MAPPING)
from scaleprotoseg_tpu.model_loading import load_model, resolve_checkpoint


def quantile_map(act_map: np.ndarray, quantile: float) -> np.ndarray:
    """Per-map quantile threshold -> binary mask, (H, W) or (1, H, W) in,
    (H, W, 1) out.  Reimplementation of the reference's missing
    ``segmentation.analysis.equivariance.quantile_map`` from its call
    sites (`metrics/consistency.py:253-266`, SURVEY.md §2.9)."""
    act = np.asarray(act_map)
    if act.ndim == 3:
        act = act[0]
    thr = np.quantile(act, quantile)
    return (act > thr).astype(np.int32)[..., None]


def dataset_meta(data_type: str):
    """(cls2name, max_parts, filter_class) per dataset
    (ref metrics/consistency.py:82-100)."""
    if data_type == "cityscapes":
        pred2name = {v - 1: k for k, v in
                     CITYSCAPES_19_EVAL_CATEGORIES.items() if v > 0}
        cls2name = {i: CITYSCAPES_CATEGORIES[k]
                    for i, k in pred2name.items()}
        return cls2name, MAX_PARTS_CITY, []
    if data_type == "pascal":
        pred2name = {v - 1: k for k, v in PASCAL_ID_MAPPING.items()
                     if v > 0}
        cls2name = {i: PASCAL_CATEGORIES[k + 1]
                    for i, k in pred2name.items()
                    if k < len(PASCAL_CATEGORIES) - 1}
        return cls2name, MAX_PARTS_PASCAL, PASCAL_FILTER_CLASS
    # The reference restricts the part metrics to cityscapes/pascal
    # (metrics/consistency.py:99-100); any dataset with annotations_PIDS
    # works here via generic class names.
    cls2name = {i: str(i) for i in range(256)}
    return cls2name, MAX_PARTS_CITY, []


def load_eval_model(model_name: str, training_phase: str,
                    results_root: Optional[str] = None):
    model_path = os.path.join(results_root or settings.results_dir(),
                              model_name)
    ckpt = resolve_checkpoint(model_path, training_phase)
    model, spec, variables = load_model(model_path, ckpt)
    return model, spec, variables, model_path


def normalize_image(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return ((x - np.asarray(IMAGENET_MEAN)) /
            np.asarray(IMAGENET_STD)).astype(np.float32)


def make_distance_fn(model):
    """Jitted (variables, image NHWC) -> (H', W', P) distances +
    activations helper."""
    import jax

    @jax.jit
    def f(variables, images):
        _, d = model.apply(variables, images, method="push_forward")
        return d

    def distances(variables, image_hwc: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(jax.device_get(
            f(variables, jnp.asarray(image_hwc[None]))))[0]

    return distances


def activation_from_distance(d: np.ndarray, epsilon: float = 1e-4
                             ) -> np.ndarray:
    return np.log((d + 1.0) / (d + epsilon))


def proto_filter(group_params: Dict, spec) -> List[int]:
    """Prototype ids used by the grouping mechanism — nonzero column sum
    in the class's group-projection matrix (ref consistency.py:34-44)."""
    gw = np.asarray(group_params["group_projection"])  # (C, G, Pc)
    out = []
    for c in range(spec.num_classes):
        class_protos = np.nonzero(spec.class_identity[:, c])[0]
        col_sums = gw[c].sum(axis=0)
        for j, p in enumerate(class_protos):
            if col_sums[j] != 0:
                out.append(int(p))
    return out


def val_image_ids(data_type: str, data_root: Optional[str] = None
                  ) -> Tuple[str, str, List[str]]:
    """(img_dir, ann_dir, ids) for the raw val split."""
    import json
    root = data_root or settings.data_path(data_type)
    img_dir = os.path.join(root, "img_with_margin_0", "val")
    ann_dir = os.path.join(root, "annotations", "val")
    with open(os.path.join(root, "all_images.json")) as f:
        ids = json.load(f)["val"]
    return img_dir, ann_dir, ids
