"""Nearest prototypes per validation image.

CLI parity with `python -m segmentation.analysis.nearest_proto`
(ref analysis/nearest_proto.py:69+): for each sampled val image, rank
prototypes by their minimum distance on the image and save a JSON index
plus activation-overlay plots of the top-k prototypes.
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
from scaleprotoseg_tpu.train.metrics import create_logger


def nearest_proto(model_name: str, training_phase: str, data_type: str,
                  top_k: int = 5, n_images: int = 10,
                  results_root: Optional[str] = None,
                  data_root: Optional[str] = None,
                  save_plots: bool = True):
    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    img_dir, _, ids = val_image_ids(data_type, data_root)
    rng = np.random.default_rng(0)
    sample = list(rng.choice(ids, min(n_images, len(ids)), replace=False))
    distance_fn = make_distance_fn(model)
    proto_class = np.argmax(spec.class_identity, axis=1)

    out_dir = os.path.join(model_path, "analysis", "nearest_proto",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    index = {}
    for img_id in sample:
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        d = distance_fn(variables, normalize_image(img))
        # distances are active-width (floor-division-leftover bank
        # rows never appear in forward)
        mins = d.reshape(-1, spec.num_active_prototypes).min(axis=0)
        top = np.argsort(mins)[:top_k]
        index[img_id] = [{"proto_id": int(p),
                          "class": int(proto_class[p]),
                          "scale": int(spec.scale_ids[p]),
                          "distance": float(mins[p])} for p in top]
        if save_plots:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, top_k + 1,
                                     figsize=(3 * (top_k + 1), 3))
            axes[0].imshow(img)
            axes[0].set_title(img_id[:18])
            axes[0].axis("off")
            for j, p in enumerate(top):
                act = activation_from_distance(d[:, :, p])
                axes[j + 1].imshow(act, cmap="jet")
                axes[j + 1].set_title(
                    f"p{p} c{proto_class[p]} s{spec.scale_ids[p]}")
                axes[j + 1].axis("off")
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"{img_id}.png"), dpi=90)
            plt.close(fig)
    with open(os.path.join(out_dir, "nearest_prototypes.json"), "w") as f:
        json.dump(index, f, indent=2)
    log(f"nearest_proto: wrote {out_dir}")
    return index


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--n-images", type=int, default=10)
    p.add_argument("--no-plots", action="store_true")
    a = p.parse_args()
    nearest_proto(a.model_name, a.training_phase, a.data_type,
                  top_k=a.top_k, n_images=a.n_images,
                  save_plots=not a.no_plots)


if __name__ == "__main__":
    main()
