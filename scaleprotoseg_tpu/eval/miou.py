"""mIoU / pixel-accuracy evaluation engine.

The reference accumulates per-class intersection/union counters over the
val split with host numpy (`eval_valid_multiscale.py:239-276`); here a
single jitted step computes a full (C, C) confusion matrix on device per
batch — logits are bilinearly upsampled to label resolution
(align_corners=False parity), argmaxed, void pixels masked, and the
confusion matrix update is one scatter-add.  IoU/accuracy derive from the
matrix exactly as the reference's I/U counters do.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.resize import resize_bilinear


def iou_from_confusion(cm: np.ndarray) -> Tuple[np.ndarray, float, float]:
    """(per-class IoU, mIoU over seen classes, pixel accuracy)."""
    cm = np.asarray(cm, np.float64)
    inter = np.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    seen = union > 0
    iou = np.where(seen, inter / np.maximum(union, 1), 0.0)
    miou = float(iou[seen].mean()) if seen.any() else 0.0
    acc = float(inter.sum() / max(cm.sum(), 1))
    return iou, miou, acc


class SegEvaluator:
    """Streaming confusion-matrix evaluator over full-resolution batches.

    ``mesh``: optional data mesh — each batch's image axis is sharded over
    it, fanning full-image inference out data-parallel; the per-batch
    confusion matrix is a cross-device reduction XLA derives from the
    sharded inputs (the (C, C) output is replicated)."""

    def __init__(self, model, num_classes: int,
                 upsample_logits: bool = True, mesh=None):
        self.num_classes = num_classes
        self.model = model
        self.upsample = upsample_logits
        self.mesh = mesh

        @jax.jit
        def step(variables, images, targets):
            out = model.apply(variables, images, train=False)
            logits = out.logits
            if self.upsample:
                logits = resize_bilinear(
                    logits, targets.shape[1], targets.shape[2])
            pred = jnp.argmax(logits, axis=-1)
            t = targets.astype(jnp.int32) - 1
            valid = t >= 0
            t_safe = jnp.clip(t, 0, num_classes - 1)
            flat = (t_safe * num_classes + pred).reshape(-1)
            weights = valid.reshape(-1).astype(jnp.float32)
            cm = jnp.zeros((num_classes * num_classes,), jnp.float32)
            cm = cm.at[flat].add(weights)
            return cm.reshape(num_classes, num_classes)

        self._step = step
        self.cm = np.zeros((num_classes, num_classes), np.float64)

    def update(self, variables, images, targets):
        images, targets = jnp.asarray(images), jnp.asarray(targets)
        if self.mesh is not None and self.mesh.devices.size > 1:
            from scaleprotoseg_tpu.parallel import shard_batch
            images, targets = shard_batch((images, targets), self.mesh)
        self.cm += np.asarray(
            jax.device_get(self._step(variables, images, targets)))

    def result(self) -> Dict:
        iou, miou, acc = iou_from_confusion(self.cm)
        return {"per_class_iou": iou.tolist(), "mean_iou": miou,
                "pixel_accuracy": acc}
