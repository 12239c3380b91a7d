"""Failure-case inspection: activations on mispredicted regions.

CLI parity with `python -m segmentation.analysis.failure_cases`
(ref analysis/failure_cases.py, ``failure_cases:32``): find the val
images with the highest pixel error rate, and for the largest
mispredicted region plot the input, GT vs prediction, and the activation
maps of the prototypes (and groups, if grouped) driving the wrong class.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from scaleprotoseg_tpu.analysis.common import (activation_from_distance,
                                               load_eval_model,
                                               normalize_image,
                                               val_image_ids)
from scaleprotoseg_tpu.constants import convert_targets
from scaleprotoseg_tpu.ops.resize import resize_label_nearest_np
from scaleprotoseg_tpu.train.metrics import create_logger


def failure_cases(model_name: str, training_phase: str, data_type: str,
                  n_images: int = 5, protos_per_case: int = 3,
                  results_root: Optional[str] = None,
                  data_root: Optional[str] = None):
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    img_dir, ann_dir, ids = val_image_ids(data_type, data_root)

    @jax.jit
    def forward(variables, image):
        out = model.apply(variables, image, train=False)
        return out.logits, out.distances

    # rank images by error rate at the prediction grid
    errors = []
    cache = {}
    for img_id in ids:
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        ann = np.load(os.path.join(ann_dir, img_id + ".npy"))
        if ann.ndim == 3:
            ann = ann[..., 0]
        ann = convert_targets(ann, data_type).astype(np.int64)
        logits, d = jax.device_get(forward(
            variables, jnp.asarray(normalize_image(img))[None]))
        pred = np.argmax(logits[0], -1)
        t = resize_label_nearest_np(
            ann, (pred.shape[1], pred.shape[0])).astype(np.int64) - 1
        valid = t >= 0
        err = float(((pred != t) & valid).sum() / max(valid.sum(), 1))
        errors.append((err, img_id))
        cache[img_id] = (img, pred, t, np.asarray(d[0]))
    errors.sort(reverse=True)

    out_dir = os.path.join(model_path, "analysis", "failure_cases",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    for err, img_id in errors[:n_images]:
        img, pred, t, d = cache[img_id]
        wrong = (pred != t) & (t >= 0)
        if not wrong.any():
            continue
        # most common wrongly-predicted class
        wrong_cls = int(np.bincount(pred[wrong],
                                    minlength=spec.num_classes).argmax())
        protos = np.nonzero(spec.class_identity[:, wrong_cls])[0]
        act = activation_from_distance(d[:, :, protos])
        strongest = protos[np.argsort(-act.reshape(-1, len(protos)).max(0)
                                      )[:protos_per_case]]
        k = protos_per_case + 3
        fig, axes = plt.subplots(1, k, figsize=(3 * k, 3))
        axes[0].imshow(img)
        axes[0].set_title(f"input (err={err:.2f})")
        axes[1].imshow(t, cmap="tab20")
        axes[1].set_title("GT")
        axes[2].imshow(np.where(wrong, pred, -1), cmap="tab20")
        axes[2].set_title(f"errors (pred {wrong_cls})")
        for j, p in enumerate(strongest):
            axes[j + 3].imshow(
                activation_from_distance(d[:, :, p]), cmap="jet")
            axes[j + 3].set_title(f"p{p}")
        for ax in axes:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{img_id}.png"), dpi=90)
        plt.close(fig)
    log(f"failure_cases: wrote {out_dir}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--n-images", type=int, default=5)
    a = p.parse_args()
    failure_cases(a.model_name, a.training_phase, a.data_type,
                  n_images=a.n_images)


if __name__ == "__main__":
    main()
