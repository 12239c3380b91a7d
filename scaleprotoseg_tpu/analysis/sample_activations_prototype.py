"""Prototype activation heatmaps on random validation samples.

CLI parity with `python -m segmentation.analysis.sample_activations_prototype`
(ref analysis/sample_activations_prototype.py): for N random val images,
plot the input, the prediction, and activation heatmaps of the strongest
prototypes of the predicted classes.
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
from scaleprotoseg_tpu.train.metrics import create_logger


def sample_activations(model_name: str, training_phase: str,
                       data_type: str, n_images: int = 5,
                       protos_per_image: int = 4,
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
    img_dir, _, ids = val_image_ids(data_type, data_root)
    rng = np.random.default_rng(0)
    sample = list(rng.choice(ids, min(n_images, len(ids)), replace=False))

    @jax.jit
    def forward(variables, image):
        out = model.apply(variables, image, train=False)
        return out.logits, out.distances

    out_dir = os.path.join(model_path, "analysis",
                           "sample_activations_prototype", training_phase)
    os.makedirs(out_dir, exist_ok=True)
    for img_id in sample:
        img = np.load(os.path.join(img_dir, img_id + ".npy"))
        logits, d = jax.device_get(forward(
            variables, jnp.asarray(normalize_image(img))[None]))
        pred = np.argmax(logits[0], axis=-1)
        act = activation_from_distance(np.asarray(d[0]))
        # strongest prototypes by max activation
        top = np.argsort(-act.reshape(
            -1, spec.num_active_prototypes).max(0)
                         )[:protos_per_image]
        k = protos_per_image + 2
        fig, axes = plt.subplots(1, k, figsize=(3 * k, 3))
        axes[0].imshow(img)
        axes[0].set_title("input")
        axes[1].imshow(pred, cmap="tab20")
        axes[1].set_title("prediction")
        for j, p in enumerate(top):
            axes[j + 2].imshow(act[:, :, p], cmap="jet")
            axes[j + 2].set_title(
                f"p{p} c{int(np.argmax(spec.class_identity[p]))}")
        for ax in axes:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{img_id}.png"), dpi=90)
        plt.close(fig)
    log(f"sample_activations_prototype: wrote {out_dir}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--n-images", type=int, default=5)
    a = p.parse_args()
    sample_activations(a.model_name, a.training_phase, a.data_type,
                       n_images=a.n_images)


if __name__ == "__main__":
    main()
