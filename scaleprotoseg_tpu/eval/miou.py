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
    sharded inputs (the (C, C) output is replicated).

    ``proto_class``: optional (P,) prototype->class array.  When given,
    every batch also contributes to the top-K nearest-prototype purity
    curve over the WHOLE split, computed on device in the same forward
    (ref eval_valid_multiscale.py:255-269: per image, 100 random
    label-resolution pixels; at each, the fraction of the K nearest
    prototypes — distances bilinearly upsampled, sampled pointwise —
    whose class equals the pixel's prediction, for every K).  The curve
    is ``result()['top_k_purity_percent']``; the reference runs this as
    a separate numpy loop per image on the full upsampled volume."""

    N_PURITY_PIXELS = 100  # ref eval_valid_multiscale.py:255

    def __init__(self, model, num_classes: int,
                 upsample_logits: bool = True, mesh=None,
                 proto_class=None, fast_output: bool = False):
        self.num_classes = num_classes
        self.model = model
        self.upsample = upsample_logits
        self.mesh = mesh
        self.proto_class = None if proto_class is None else \
            np.asarray(proto_class, np.int32)
        if self.proto_class is not None and not upsample_logits:
            # purity pixels are drawn at LABEL resolution; without the
            # logits upsample pred[r, c] would silently clamp out-of-range
            # indices to the border and corrupt the curve
            raise ValueError(
                "proto_class purity requires upsample_logits=True")
        # fast_output: predict via the fused upsample+argmax Pallas
        # kernel (ops/pallas_upsample.py) instead of materializing the
        # full-res fp32 logits (159 MB/image at Cityscapes resolution).
        # OPT-IN: the kernel equals argmax(separable-matmul upsample)
        # bit-for-bit, but its fp32 summation ORDER differs from
        # jax.image.resize's gather form, so near-tie pixels can flip —
        # audited on trained checkpoints in benchmarks/bench_eval.py and
        # tests/test_eval_cli.py (mismatch <=0.1% of pixels, |dmIoU|
        # within noise).  Off-TPU the flag falls back to the XLA path
        # unless SCALEPROTOSEG_FORCE_FAST_OUTPUT=interpret (test hook,
        # same pattern as the fused ASPP's force env).
        import os
        force = os.environ.get("SCALEPROTOSEG_FORCE_FAST_OUTPUT", "")
        self.fast_output = bool(fast_output and upsample_logits and (
            jax.default_backend() == "tpu" or force))
        interpret = force == "interpret"

        @jax.jit
        def step(variables, images, targets, rows, cols):
            out = model.apply(variables, images, train=False)
            logits = out.logits
            if self.fast_output:
                from scaleprotoseg_tpu.ops.pallas_upsample import (
                    fused_upsample_argmax_sharded)
                pred = fused_upsample_argmax_sharded(
                    logits.astype(jnp.float32), targets.shape[1],
                    targets.shape[2], interpret=interpret)
            else:
                if self.upsample:
                    logits = resize_bilinear(
                        logits, targets.shape[1], targets.shape[2])
                pred = jnp.argmax(logits, axis=-1)

            purity = None
            if self.proto_class is not None:
                from scaleprotoseg_tpu.ops.resize import bilinear_sample
                d = out.distances.astype(jnp.float32)      # (B, h, w, P)
                sd = bilinear_sample(d, rows, cols,
                                     targets.shape[1], targets.shape[2])
                sp = jax.vmap(lambda p, r, c: p[r, c])(pred, rows, cols)
                order = jnp.argsort(sd, axis=-1)           # (B, n, P)
                pc = jnp.asarray(self.proto_class)
                is_cls = (pc[order] == sp[..., None]).astype(jnp.float32)
                k = jnp.arange(1, d.shape[-1] + 1, dtype=jnp.float32)
                frac = jnp.cumsum(is_cls, axis=-1) / k
                # reduce over the batch ON DEVICE: the (P,) sum is
                # replicated under batch sharding (one cross-device
                # reduction instead of a (B, P) fetch), which also makes
                # multi-process eval possible — sharded per-image rows
                # are not host-addressable there
                purity = jnp.sum(frac.mean(axis=1), axis=0) * 100.0  # (P,)

            t = targets.astype(jnp.int32) - 1
            valid = t >= 0
            t_safe = jnp.clip(t, 0, num_classes - 1)
            # Confusion matrix as a one-hot einsum, scanned over pixel
            # chunks: a flat scatter-add costs ~18 ms/image on TPU (the
            # scatter lowers to a serial loop) while the MXU does the
            # same contraction in <0.1 ms; chunking caps the one-hot
            # working set for large-C datasets (ADE 150 / COCO 182).
            # Exact at any batch size: each per-chunk fp32 cell count is
            # <= chunk (2^19 < 2^24, exact in fp32); the cross-chunk
            # carry is int32 (exact to 2^31 pixels per batch).
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
                chunk_cm = jnp.einsum(
                    "nc,nd->cd", oh_t, oh_p,
                    preferred_element_type=jnp.float32)
                return cm + chunk_cm.astype(jnp.int32), None

            cm0 = jnp.zeros((num_classes, num_classes), jnp.int32)
            cm, _ = jax.lax.scan(
                body, cm0, (flat_t.reshape(k, chunk),
                            flat_p.reshape(k, chunk),
                            w.reshape(k, chunk)))
            return cm, purity

        self._step = step
        self._cm = np.zeros((num_classes, num_classes), np.float64)
        self._purity_sum = None
        self._purity_images = 0
        if self.proto_class is not None:
            self._purity_sum = np.zeros(len(self.proto_class), np.float64)
            # fixed seed: reproducible artifact (the reference uses the
            # global numpy RNG)
            self._purity_rng = np.random.default_rng(0)

        def _fold(item):
            n_imgs, (cm, purity_sum) = item
            self._cm += np.asarray(cm, np.float64)
            if purity_sum is not None:
                self._purity_sum += np.asarray(purity_sum, np.float64)
                self._purity_images += n_imgs

        # Per-batch (C, C) matrices are kept on device and fetched in
        # bulk: a device_get per batch would serialize the eval loop on
        # the host round-trip (measured ~15 ms/image through the hosted
        # tunnel).  Draining every 64 batches bounds device memory while
        # keeping the exact float64 accumulation host-side.
        from scaleprotoseg_tpu.parallel import BulkFetcher
        self._fetcher = BulkFetcher(_fold, limit=64)

    @property
    def cm(self) -> np.ndarray:
        """Current confusion matrix; drains pending device batches first
        so external readers never observe partial counts."""
        self._flush()
        return self._cm

    def _flush(self):
        self._fetcher.drain()

    def update(self, variables, images, targets):
        images, targets = jnp.asarray(images), jnp.asarray(targets)
        b = images.shape[0]
        n = self.N_PURITY_PIXELS
        if self.proto_class is not None:
            # per image: rows then cols, mirroring the reference's draw
            # order (eval_valid_multiscale.py:257-258)
            rc = [(self._purity_rng.integers(0, targets.shape[1], size=n),
                   self._purity_rng.integers(0, targets.shape[2], size=n))
                  for _ in range(b)]
            rows = jnp.asarray(np.stack([r for r, _ in rc]), jnp.int32)
            cols = jnp.asarray(np.stack([c for _, c in rc]), jnp.int32)
        else:
            rows = cols = jnp.zeros((b, n), jnp.int32)
        if self.mesh is not None and self.mesh.devices.size > 1:
            # multi-process: each process passes its LOCAL rows of the
            # global batch (per-host loader shard); purity pixels are
            # then drawn per-host, which is statistically equivalent to
            # the single-process stream.  All step outputs are replicated
            # reductions, so every process accumulates the full result.
            from scaleprotoseg_tpu.parallel import assemble_global_batch
            images, targets, rows, cols = assemble_global_batch(
                (images, targets, rows, cols), self.mesh)
            b = int(images.shape[0])
        self._fetcher.add((b, self._step(variables, images, targets, rows,
                                         cols)))

    def result(self) -> Dict:
        self._flush()
        iou, miou, acc = iou_from_confusion(self._cm)
        out = {"per_class_iou": iou.tolist(), "mean_iou": miou,
               "pixel_accuracy": acc}
        if self.proto_class is not None and self._purity_images:
            out["top_k_purity_percent"] = (
                self._purity_sum / self._purity_images).tolist()
            out["purity_images"] = self._purity_images
        return out
