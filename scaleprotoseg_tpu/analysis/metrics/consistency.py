"""Consistency interpretability metric.

CLI parity with `python -m segmentation.analysis.metrics.consistency
<model_name> <training_phase> <data_type> [--quantile] [--threshold]
[--group-name]` (ref metrics/consistency.py:47-182): a prototype is
*consistent* if, averaged over val images containing its class, its
quantile-thresholded activation hits the same object part (panoptic-parts
centroid test) in more than ``threshold`` of the images.  The score is
the fraction of consistent prototypes.  Requires the
``annotations_PIDS/val`` part annotations from the part preprocessors.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
import pandas as pd

from scaleprotoseg_tpu.analysis.common import (dataset_meta,
                                               load_eval_model,
                                               make_distance_fn,
                                               normalize_image,
                                               proto_filter, val_image_ids)
from scaleprotoseg_tpu.analysis.metrics.parts import part_intersect
from scaleprotoseg_tpu.checkpoints.io import load_checkpoint
from scaleprotoseg_tpu.constants import convert_targets
from scaleprotoseg_tpu.train.metrics import create_logger


def _collect_presence(model_name: str, training_phase: str,
                      data_type: str, quantile: float,
                      group_name: Optional[str], results_root,
                      data_root, log, noise_std: Optional[float] = None,
                      nan_missing_parts: bool = True, limit=None):
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    cls2name, max_parts, filter_class = dataset_meta(data_type)

    proto_ids = None
    if group_name is not None:
        group_ckpt = os.path.join(
            results_root or os.environ.get("RESULTS_DIR", "results"),
            group_name, "checkpoints", "th-0.05-nopush-group_last.ckpt")
        gparams, _, _ = load_checkpoint(group_ckpt)
        proto_ids = proto_filter(gparams, spec)
        log(f"Group filter keeps {len(proto_ids)} prototypes")

    img_dir, ann_dir, ids = val_image_ids(data_type, data_root)
    part_dir = os.path.join(os.path.dirname(ann_dir) + "_PIDS", "val")
    distance_fn = make_distance_fn(model)
    rng = np.random.default_rng(0)

    rows = []
    n = 0
    for img_id in ids:
        part_path = os.path.join(part_dir, img_id + ".npy")
        if not os.path.exists(part_path):
            continue  # pascal: only annotated overlap (ref :148)
        if limit and n >= limit:
            break
        n += 1
        part_ann = np.load(part_path)
        cls_ann = np.load(os.path.join(ann_dir, img_id + ".npy"))
        if cls_ann.ndim == 3:
            cls_ann = cls_ann[..., 0]
        cls_ann = convert_targets(cls_ann, data_type).astype(np.int64)
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        x = normalize_image(img)
        if noise_std is not None:
            x = x + noise_std * rng.standard_normal(x.shape).astype(
                np.float32)
        d = distance_fn(variables, x)
        rows.extend(part_intersect(
            d, cls_ann, part_ann, spec, cls2name, img_id, quantile,
            max_parts, filter_proto_ids=proto_ids,
            filter_class_ids=filter_class,
            nan_missing_parts=nan_missing_parts))
    return rows, max_parts, model_path


def run_consistency(model_name: str, training_phase: str, data_type: str,
                    quantile: float = 0.8, threshold: float = 0.8,
                    group_name: Optional[str] = None,
                    results_root: Optional[str] = None,
                    data_root: Optional[str] = None,
                    limit: Optional[int] = None) -> float:
    log = create_logger(None)
    rows, max_parts, model_path = _collect_presence(
        model_name, training_phase, data_type, quantile, group_name,
        results_root, data_root, log, limit=limit)
    out_dir = os.path.join(model_path, "metrics", training_phase)
    os.makedirs(out_dir, exist_ok=True)

    part_cols = [f"part_{i}" for i in range(max_parts + 1)]
    df = pd.DataFrame(rows, columns=part_cols +
                      ["proto_id", "class", "img_id"])
    df.to_csv(os.path.join(
        out_dir, f"part_presence_th_{threshold}_qt_{quantile}.csv"),
        index=False)

    df_mean = df.groupby(["class", "proto_id"])[part_cols].agg(
        lambda x: np.nanmean(x)).reset_index()
    flags = (df_mean[part_cols] > threshold).astype(int)
    df_mean["is_consistent"] = flags.max(axis=1)
    df_mean.to_csv(os.path.join(
        out_dir, f"part_presence_mean_th_{threshold}_qt_{quantile}.csv"),
        index=False)
    score = float(df_mean.is_consistent.mean()) if len(df_mean) else 0.0
    log(f"Consistency score: {score}")
    with open(os.path.join(
            out_dir,
            f"consistency_score_th_{threshold}_qt_{quantile}.txt"),
            "w") as f:
        f.write(f"{score}")
    return score


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--quantile", type=float, default=0.8)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--group-name", default=None)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args()
    run_consistency(a.model_name, a.training_phase, a.data_type,
                    quantile=a.quantile, threshold=a.threshold,
                    group_name=a.group_name, limit=a.limit)


if __name__ == "__main__":
    main()
