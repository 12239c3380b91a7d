"""IoU between prototype activation masks.

CLI parity with `python -m segmentation.analysis.prototype_overlap`
(ref analysis/prototype_overlap.py, ``run_proto_activation:95``): for
each val image and each same-class prototype pair, threshold both
activation maps at a quantile and record the IoU of the binary masks —
low overlap indicates prototypes specialize on different regions.
Outputs a CSV of pair IoUs and a per-class mean summary.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
from typing import Optional

import numpy as np
import pandas as pd

from scaleprotoseg_tpu.analysis.common import (activation_from_distance,
                                               load_eval_model,
                                               make_distance_fn,
                                               normalize_image,
                                               quantile_map, val_image_ids)
from scaleprotoseg_tpu.train.metrics import create_logger


def run_proto_activation(model_name: str, training_phase: str,
                         data_type: str, quantile: float = 0.8,
                         n_images: int = 20,
                         results_root: Optional[str] = None,
                         data_root: Optional[str] = None) -> pd.DataFrame:
    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    img_dir, _, ids = val_image_ids(data_type, data_root)
    rng = np.random.default_rng(0)
    sample = list(rng.choice(ids, min(n_images, len(ids)), replace=False))
    distance_fn = make_distance_fn(model)

    rows = []
    for img_id in sample:
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        d = distance_fn(variables, normalize_image(img))
        masks = {}
        for c in range(spec.num_classes):
            protos = np.nonzero(spec.class_identity[:, c])[0]
            for p in protos:
                masks[p] = quantile_map(
                    activation_from_distance(d[:, :, p]), quantile)[..., 0]
            for p1, p2 in itertools.combinations(protos, 2):
                inter = np.logical_and(masks[p1], masks[p2]).sum()
                union = np.logical_or(masks[p1], masks[p2]).sum()
                rows.append({"img_id": img_id, "class": int(c),
                             "proto_a": int(p1), "proto_b": int(p2),
                             "iou": float(inter / union) if union else 0.0})
    df = pd.DataFrame(rows)
    out_dir = os.path.join(model_path, "analysis", "prototype_overlap",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    df.to_csv(os.path.join(out_dir, f"pair_iou_qt_{quantile}.csv"),
              index=False)
    summary = df.groupby("class").iou.mean().to_dict() if len(df) else {}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"mean_iou": float(df.iou.mean()) if len(df) else 0.0,
                   "per_class": {str(k): float(v)
                                 for k, v in summary.items()}}, f,
                  indent=2)
    log(f"prototype_overlap: mean pair IoU = "
        f"{df.iou.mean() if len(df) else 0.0:.4f}")
    return df


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--quantile", type=float, default=0.8)
    p.add_argument("--n-images", type=int, default=20)
    a = p.parse_args()
    run_proto_activation(a.model_name, a.training_phase, a.data_type,
                         quantile=a.quantile, n_images=a.n_images)


if __name__ == "__main__":
    main()
