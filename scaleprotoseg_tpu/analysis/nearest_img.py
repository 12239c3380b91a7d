"""Top-n nearest validation images per prototype.

CLI parity with `python -m segmentation.analysis.nearest_img`
(ref analysis/nearest_img.py:66+): for each prototype, rank images by
their minimum (void-masked) distance, save a JSON index and a grid plot
of the top-n images with the prototype's activation overlaid.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from scaleprotoseg_tpu.analysis.common import (activation_from_distance,
                                               load_eval_model,
                                               make_distance_fn,
                                               normalize_image,
                                               val_image_ids)
from scaleprotoseg_tpu.constants import convert_targets
from scaleprotoseg_tpu.train.metrics import create_logger


def nearest_img(model_name: str, training_phase: str, data_type: str,
                top_n: int = 5, results_root: Optional[str] = None,
                data_root: Optional[str] = None,
                limit: Optional[int] = None, save_plots: bool = True):
    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    img_dir, ann_dir, ids = val_image_ids(data_type, data_root)
    if limit:
        ids = ids[:limit]
    distance_fn = make_distance_fn(model)
    P = spec.num_active_prototypes  # model distances are active-width

    mins = np.full((len(ids), P), np.inf)
    for i, img_id in enumerate(ids):
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        ann = np.load(os.path.join(ann_dir, img_id + ".npy"))
        if ann.ndim == 3:
            ann = ann[..., 0]
        ann = convert_targets(ann, data_type)
        d = distance_fn(variables, normalize_image(img))
        # mask void at the distance grid
        from scaleprotoseg_tpu.ops.resize import resize_label_nearest_np
        t = resize_label_nearest_np(ann, (d.shape[1], d.shape[0]))
        dm = d + 1e7 * (t[..., None] == 0)
        mins[i] = dm.reshape(-1, P).min(axis=0)

    order = np.argsort(mins, axis=0)[:top_n]  # (top_n, P)
    out_dir = os.path.join(model_path, "analysis", "nearest_img",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    index = {str(p): [{"img_id": ids[int(order[r, p])],
                       "distance": float(mins[int(order[r, p]), p])}
                      for r in range(min(top_n, len(ids)))]
             for p in range(P)}
    with open(os.path.join(out_dir, "nearest_images.json"), "w") as f:
        json.dump(index, f, indent=2)

    if save_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for p in range(P):
            fig, axes = plt.subplots(1, min(top_n, len(ids)),
                                     figsize=(3 * top_n, 3), squeeze=False)
            for r in range(min(top_n, len(ids))):
                img_id = ids[int(order[r, p])]
                img = np.load(os.path.join(img_dir, img_id + ".npy"))
                d = distance_fn(variables, normalize_image(img))
                act = activation_from_distance(d[:, :, p])
                ax = axes[0, r]
                ax.imshow(img)
                ax.imshow(np.kron(act, np.ones(
                    (img.shape[0] // act.shape[0] + 1,
                     img.shape[1] // act.shape[1] + 1)))[:img.shape[0],
                                                         :img.shape[1]],
                          alpha=0.4, cmap="jet")
                ax.axis("off")
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"proto_{p}.png"), dpi=90)
            plt.close(fig)
    log(f"nearest_img: wrote {out_dir}")
    return index


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--top-n", type=int, default=5)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no-plots", action="store_true")
    a = p.parse_args()
    nearest_img(a.model_name, a.training_phase, a.data_type,
                top_n=a.top_n, limit=a.limit, save_plots=not a.no_plots)


if __name__ == "__main__":
    main()
