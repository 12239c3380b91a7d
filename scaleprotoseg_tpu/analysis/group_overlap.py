"""IoU between group activation masks.

CLI parity with `python -m segmentation.analysis.group_overlap`
(ref analysis/group_overlap.py, ``run_group_overlap:90``): the group-level
analog of prototype_overlap — threshold each group's activation map at a
quantile and record pairwise IoU within each class.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
from typing import Optional

import numpy as np
import pandas as pd

from scaleprotoseg_tpu.analysis.common import (load_eval_model,
                                               normalize_image,
                                               quantile_map, val_image_ids)
from scaleprotoseg_tpu.train.metrics import create_logger


def run_group_overlap(model_name: str, training_phase: str,
                      data_type: str, quantile: float = 0.8,
                      n_images: int = 20,
                      results_root: Optional[str] = None,
                      data_root: Optional[str] = None) -> pd.DataFrame:
    import jax
    import jax.numpy as jnp

    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    if not model.grouped:
        raise ValueError("group_overlap requires a grouped model")
    img_dir, _, ids = val_image_ids(data_type, data_root)
    rng = np.random.default_rng(0)
    sample = list(rng.choice(ids, min(n_images, len(ids)), replace=False))

    @jax.jit
    def group_maps(variables, image):
        out = model.apply(variables, image, train=False)
        return out.group_activations  # (1, H', W', C, G)

    rows = []
    for img_id in sample:
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        g = np.asarray(jax.device_get(group_maps(
            variables, jnp.asarray(normalize_image(img))[None])))[0]
        for c in range(spec.num_classes):
            masks = {k: quantile_map(g[:, :, c, k], quantile)[..., 0]
                     for k in range(spec.num_groups)}
            for k1, k2 in itertools.combinations(range(spec.num_groups),
                                                 2):
                inter = np.logical_and(masks[k1], masks[k2]).sum()
                union = np.logical_or(masks[k1], masks[k2]).sum()
                rows.append({"img_id": img_id, "class": int(c),
                             "group_a": k1, "group_b": k2,
                             "iou": float(inter / union) if union
                             else 0.0})
    df = pd.DataFrame(rows)
    out_dir = os.path.join(model_path, "analysis", "group_overlap",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    df.to_csv(os.path.join(out_dir, f"pair_iou_qt_{quantile}.csv"),
              index=False)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"mean_iou": float(df.iou.mean()) if len(df) else 0.0},
                  f, indent=2)
    log(f"group_overlap: mean pair IoU = "
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
    run_group_overlap(a.model_name, a.training_phase, a.data_type,
                      quantile=a.quantile, n_images=a.n_images)


if __name__ == "__main__":
    main()
