"""Test-split inference + benchmark-format PNG export.

CLI parity with `python -m segmentation.eval_test <model_name>
<training_phase> [batch_size] [--pascal]` (ref eval_test.py): runs the
model over the test split, maps train ids back to the source dataset's
label ids (Cityscapes: train id -> category name -> official id;
Pascal: inverse of the +1 shift), and saves grayscale PNG predictions
for benchmark-server submission.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
from PIL import Image

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.constants import (
    CITYSCAPES_19_EVAL_CATEGORIES, CITYSCAPES_CATEGORIES,
    CITYSCAPES_ID_2_LABEL, IMAGENET_MEAN, IMAGENET_STD, PASCAL_ID_MAPPING)
from scaleprotoseg_tpu.model_loading import load_model, resolve_checkpoint
from scaleprotoseg_tpu.ops.resize import resize_bilinear
from scaleprotoseg_tpu.train.metrics import create_logger


def train_id_to_source_lut(pascal: bool) -> np.ndarray:
    """LUT over (1 + train id) -> source dataset id (ref eval_test.py:52-61)."""
    id_mapping = PASCAL_ID_MAPPING if pascal else \
        CITYSCAPES_19_EVAL_CATEGORIES
    ours2source = {v: k for k, v in id_mapping.items()}
    if not pascal:
        ours2source[0] = 0
        rev = {v: k for k, v in CITYSCAPES_ID_2_LABEL.items()}
        ours2source = {k: rev[CITYSCAPES_CATEGORIES[v]]
                       for k, v in ours2source.items()}
    lut = np.zeros(256, np.int64)
    for k, v in ours2source.items():
        lut[k] = v
    return lut


def run_evaluation(model_name: str, training_phase: str,
                   batch_size: int = 2, pascal: bool = False,
                   margin: int = 0, limit: Optional[int] = None,
                   data_root: Optional[str] = None,
                   results_root: Optional[str] = None,
                   fast: bool = True, fp32: bool = False) -> str:
    import jax
    import jax.numpy as jnp

    data_type = "pascal" if pascal else "cityscapes"
    model_path = os.path.join(results_root or settings.results_dir(),
                              model_name)
    checkpoint = resolve_checkpoint(model_path, training_phase)
    out_dir = os.path.join(model_path, "evaluation", "test", training_phase)
    os.makedirs(out_dir, exist_ok=True)
    log = create_logger(os.path.join(out_dir, "eval.log"))
    log(f"Loading model from {checkpoint}")
    # --fp32 = reference-parity forward (fp32/XLA; the fused ASPP only
    # engages at bf16), for submission-grade test predictions
    model, spec, variables = load_model(
        model_path, checkpoint,
        dtype=jnp.float32 if fp32 else jnp.bfloat16, fast=fast)

    dataset_path = data_root or settings.data_path(data_type)
    img_dir = os.path.join(dataset_path, f"img_with_margin_{margin}",
                           "test")
    files = sorted(p[:-4] for p in os.listdir(img_dir)
                   if p.endswith(".npy"))
    if limit:
        files = files[:limit]
    lut = train_id_to_source_lut(pascal)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def forward(variables, x, out_h, out_w):
        out = model.apply(variables, x, train=False)
        logits = resize_bilinear(out.logits, out_h, out_w)
        return jnp.argmax(logits, axis=-1)

    import cv2
    for start in range(0, len(files), batch_size):
        chunk = files[start:start + batch_size]
        imgs, shapes = [], []
        for name in chunk:
            img = np.load(os.path.join(img_dir, name + ".npy")
                          ).astype(np.uint8)
            if margin:
                img = img[margin:-margin, margin:-margin]
            shapes.append(img.shape[:2])
            x = (img.astype(np.float32) / 255.0 - mean) / std
            if pascal:
                x = cv2.resize(x, (513, 513),
                               interpolation=cv2.INTER_LINEAR)
            imgs.append(x)
        if len(set(shapes)) > 1:
            batches = [([im], [sh], [nm]) for im, sh, nm in
                       zip(imgs, shapes, chunk)]
        else:
            batches = [(imgs, shapes, chunk)]
        for bimgs, bshapes, bnames in batches:
            h, w = bshapes[0]
            pred = np.asarray(jax.device_get(forward(
                variables, jnp.asarray(np.stack(bimgs)), h, w)))
            for i, name in enumerate(bnames):
                source = lut[pred[i] + 1].astype(np.uint8)
                Image.fromarray(source).convert("L").save(
                    os.path.join(out_dir, f"{name}.png"))
    log(f"Saved {len(files)} test predictions to {out_dir}")
    return out_dir


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("batch_size", nargs="?", type=int, default=2)
    p.add_argument("--pascal", action="store_true")
    p.add_argument("--margin", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--fp32", action="store_true",
                   help="fp32/XLA forward (reference parity; default "
                   "bf16 is the speed path)")
    a = p.parse_args()
    run_evaluation(a.model_name, a.training_phase, a.batch_size,
                   pascal=a.pascal, margin=a.margin, limit=a.limit,
                   data_root=a.data_root, fp32=a.fp32)


if __name__ == "__main__":
    main()
