"""mIoU / pixel-accuracy evaluation engine.

The reference accumulates per-class intersection/union counters over the
val split with host numpy (`eval_valid_multiscale.py:239-276`); here a
single jitted step computes a full (C, C) confusion matrix on device per
batch — logits are bilinearly upsampled to label resolution
(align_corners=False parity), argmaxed, void pixels masked, and the
confusion matrix accumulated as a chunked one-hot einsum on the MXU.
IoU/accuracy derive from the matrix exactly as the reference's I/U
counters do.
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
            # Confusion matrix as a one-hot einsum, scanned over pixel
            # chunks: a flat scatter-add costs ~18 ms/image on TPU (the
            # scatter lowers to a serial loop) while the MXU does the
            # same contraction in <0.1 ms; chunking caps the one-hot
            # working set for large-C datasets (ADE 150 / COCO 182).
            # Exact: 0/1 in bf16, fp32 accumulation, chunk counts < 2^24.
            chunk = 1 << 19
            flat_t = t_safe.reshape(-1)
            flat_p = pred.reshape(-1)
            w = valid.reshape(-1).astype(jnp.bfloat16)
            pad = (-flat_t.size) % chunk
            if pad:
                flat_t = jnp.pad(flat_t, (0, pad))
                flat_p = jnp.pad(flat_p, (0, pad))
                w = jnp.pad(w, (0, pad))
            k = flat_t.size // chunk

            def body(cm, args):
                ct, cp, cw = args
                oh_t = jax.nn.one_hot(ct, num_classes,
                                      dtype=jnp.bfloat16) * cw[:, None]
                oh_p = jax.nn.one_hot(cp, num_classes, dtype=jnp.bfloat16)
                return cm + jnp.einsum(
                    "nc,nd->cd", oh_t, oh_p,
                    preferred_element_type=jnp.float32), None

            cm0 = jnp.zeros((num_classes, num_classes), jnp.float32)
            cm, _ = jax.lax.scan(
                body, cm0, (flat_t.reshape(k, chunk),
                            flat_p.reshape(k, chunk),
                            w.reshape(k, chunk)))
            return cm

        self._step = step
        self.cm = np.zeros((num_classes, num_classes), np.float64)
        # Per-batch (C, C) matrices are kept on device and fetched in
        # bulk: a device_get per batch would serialize the eval loop on
        # the host round-trip (measured ~15 ms/image through the hosted
        # tunnel).  Draining every 64 batches bounds device memory while
        # keeping the exact float64 accumulation host-side.
        from scaleprotoseg_tpu.parallel import BulkFetcher
        self._fetcher = BulkFetcher(
            lambda cm: self.cm.__iadd__(np.asarray(cm, np.float64)),
            limit=64)

    def _flush(self):
        self._fetcher.drain()

    def update(self, variables, images, targets):
        images, targets = jnp.asarray(images), jnp.asarray(targets)
        if self.mesh is not None and self.mesh.devices.size > 1:
            from scaleprotoseg_tpu.parallel import shard_batch
            images, targets = shard_batch((images, targets), self.mesh)
        self._fetcher.add(self._step(variables, images, targets))

    def result(self) -> Dict:
        self._flush()
        iou, miou, acc = iou_from_confusion(self.cm)
        return {"per_class_iou": iou.tolist(), "mean_iou": miou,
                "pixel_accuracy": acc}
