"""Validation-set evaluation (multi-scale / grouped models).

CLI parity with `python -m segmentation.eval_valid_multiscale
<model_name> <training_phase> [batch_size] [data_type]`
(ref eval_valid_multiscale.py:33-414): loads the run's checkpoint,
runs full-image (cityscapes/coco/em) or resized (pascal 513, ade
short-side 512) inference over the raw val ``.npy`` files, bilinearly
upsamples logits to label resolution, and accumulates mIoU / pixel
accuracy ignoring void.  Writes ``evaluation/<phase>/iou_scores.json``,
``mean_iou.txt``, a per-class IoU bar chart, and same-class prototype
distance histograms.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.constants import (
    ADE20k_ID_2_LABEL, CITYSCAPES_19_EVAL_CATEGORIES, CITYSCAPES_CATEGORIES,
    COCO_ID_2_LABEL, EM_ID_2_LABEL, IMAGENET_MEAN, IMAGENET_STD,
    PASCAL_CATEGORIES, PASCAL_ID_MAPPING, convert_targets)
from scaleprotoseg_tpu.eval.miou import SegEvaluator
from scaleprotoseg_tpu.model_loading import load_model, resolve_checkpoint
from scaleprotoseg_tpu.train.metrics import create_logger


def class_names(data_type: str, num_classes: int) -> List[str]:
    if data_type == "cityscapes":
        inv = {v - 1: k for k, v in CITYSCAPES_19_EVAL_CATEGORIES.items()
               if v > 0}
        return [CITYSCAPES_CATEGORIES[inv[i]] for i in range(num_classes)]
    if data_type == "pascal":
        inv = {v - 1: k for k, v in PASCAL_ID_MAPPING.items() if v > 0}
        return [PASCAL_CATEGORIES[inv[i] + 1] if inv[i] + 1 <
                len(PASCAL_CATEGORIES) else str(i)
                for i in range(num_classes)]
    if data_type == "ade":
        return [ADE20k_ID_2_LABEL[i] for i in range(num_classes)]
    if data_type == "em":
        return [EM_ID_2_LABEL[i] for i in range(num_classes)]
    if data_type == "coco":
        return [COCO_ID_2_LABEL[i] for i in range(num_classes)]
    return [str(i) for i in range(num_classes)]


def ade_eval_shape(h: int, w: int,
                   shape_multiple: Optional[int] = None
                   ) -> "tuple[int, int]":
    """ADE eval target (th, tw): aspect-preserving short-side-512 resize
    (ref eval_valid_multiscale.py:197-203), optionally rounded to a
    multiple (see ``_prepare_image``).  Single source of truth — the
    shape-regime benchmark (benchmarks/bench_eval_datasets.py) measures
    exactly this arithmetic."""
    s = 512 / min(h, w)
    tw, th = int(round(w * s)), int(round(h * s))
    if shape_multiple:
        tw = max(shape_multiple, round(tw / shape_multiple)
                 * shape_multiple)
        th = max(shape_multiple, round(th / shape_multiple)
                 * shape_multiple)
    return th, tw


def _prepare_image(img: np.ndarray, ann_shape, data_type: str,
                   shape_multiple: Optional[int] = None) -> np.ndarray:
    """Normalize + dataset-specific eval resizing
    (ref eval_valid_multiscale.py:185-214).

    ``shape_multiple``: optionally round the (already resized) ADE target
    dims to a multiple — each distinct eval shape costs one XLA compile
    of the full forward, and ADE's aspect-preserving short-side-512
    resize yields many; rounding to e.g. 64 collapses them to a handful
    at a sub-percent deviation from the reference's exact protocol.
    Default None = exact reference sizing."""
    import cv2

    x = img.astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    if data_type == "pascal":
        x = cv2.resize(x, (513, 513), interpolation=cv2.INTER_LINEAR)
    elif data_type == "ade":
        th, tw = ade_eval_shape(*x.shape[:2], shape_multiple)
        x = cv2.resize(x, (tw, th), interpolation=cv2.INTER_LINEAR)
    return x


def run_evaluation(model_name: str, training_phase: str,
                   batch_size: int = 2, data_type: str = "cityscapes",
                   margin: int = 0, limit: Optional[int] = None,
                   data_root: Optional[str] = None,
                   results_root: Optional[str] = None,
                   fast: bool = True,
                   fast_output: Optional[bool] = None,
                   shape_multiple: Optional[int] = None,
                   quant8=False, calib_images: int = 8,
                   fp32: bool = False) -> dict:
    if shape_multiple is None and data_type == "ade":
        # ADE's aspect-preserving short-side-512 protocol yields ~100s of
        # distinct eval shapes; each costs a full-forward XLA compile
        # (~11.6 s measured, benchmarks/bench_eval_datasets.py).  Rounding
        # to 64 collapses them to a handful at sub-percent deviation;
        # pass shape_multiple=0 for the reference-exact protocol (the
        # Zenodo parity gate).
        shape_multiple = 64
    if shape_multiple == 0:
        shape_multiple = None
    import jax
    if jax.process_count() > 1:
        # the per-image artifact loops (histograms, samples, PNG export)
        # are single-process by design; each process would also feed the
        # FULL split into the evaluator, double-counting the confusion
        # matrix.  Multi-chip eval shards over the in-process mesh.
        raise RuntimeError(
            "eval_valid_multiscale is a single-process tool (it fans out "
            "over the in-process device mesh); run it on one host")
    model_path = os.path.join(results_root or settings.results_dir(),
                              model_name)
    checkpoint = resolve_checkpoint(model_path, training_phase)
    # quantized evals get their own results dir: the point of running
    # them is to compare against the bf16 numbers, not overwrite them
    eval_name = training_phase + (
        "-quant8static" if quant8 == "static" else
        "-quant8" if quant8 else "")
    out_dir = os.path.join(model_path, "evaluation", eval_name)
    os.makedirs(out_dir, exist_ok=True)
    log = create_logger(os.path.join(out_dir, "eval.log"))
    log(f"Loading model from {checkpoint}")

    import jax.numpy as jnp

    from scaleprotoseg_tpu import cli_common
    # The fused Pallas ASPP carries a batch-dim custom_partitioning rule
    # (ops/pallas_aspp.py fused_aspp_sharded): on a >1-device mesh each
    # device runs the kernel on its batch shard, so multi-chip eval
    # keeps both the data-parallel fan-out and the fused head.
    # fp32: the reference-parity forward (the reference evals in torch
    # fp32) — the fused Pallas ASPP only engages at bf16, so this also
    # forces the XLA compute path; combine with --exact-output for the
    # fully reference-exact Zenodo mIoU protocol.  Default bf16: the
    # speed path (argmax flips vs fp32 are near-tie pixels only).
    model, spec, variables = load_model(
        model_path, checkpoint,
        dtype=jnp.float32 if fp32 else jnp.bfloat16, fast=fast,
        quant8=quant8)
    if quant8 is True and fast_output is not False:
        # dynamic quant8 flips XLA's activation layouts; ANY downstream
        # Pallas call (here the fused upsample+argmax) then forces a
        # relayout measured at a 3x whole-model cliff (ops/quant.py) —
        # static quant8 composes cliff-free and keeps the fast path
        log("dynamic quant8: forcing the XLA upsample path "
            "(Pallas relayout cliff; use --quant8-static for speed)")
        fast_output = False
    # load_model parsed the run's config.gin; training_mesh queries the
    # pinned device count / slice layout from it
    mesh = cli_common.training_mesh()
    dataset_path = data_root or settings.data_path(data_type)
    img_dir = os.path.join(dataset_path, f"img_with_margin_{margin}", "val")
    ann_dir = os.path.join(dataset_path, "annotations", "val")
    files = sorted(p[:-4] for p in os.listdir(img_dir)
                   if p.endswith(".npy"))
    if limit:
        files = files[:limit]
    log(f"Evaluating {len(files)} val images ({data_type})")

    def load_one(name):
        img = np.load(os.path.join(img_dir, name + ".npy"))
        if margin:
            img = img[margin:-margin, margin:-margin]
        ann = np.load(os.path.join(ann_dir, name + ".npy"))
        if ann.ndim == 3:
            ann = ann[..., 0]
        ann = convert_targets(ann, data_type).astype(np.int32)
        return _prepare_image(img, ann.shape, data_type,
                              shape_multiple), ann

    if quant8 == "static":
        # PTQ calibration on the first val images at their real eval
        # shapes, exactly like the serving path (model_loading.
        # calibrate_quant_scales); the calibrated variables then run the
        # full protocol, so the reported mIoU/pixel-acc delta vs the
        # bf16 eval dir IS the accuracy cost of deploying --quant8-static
        from scaleprotoseg_tpu.model_loading import calibrate_quant_scales
        calib = [load_one(n)[0][None].astype(np.float32)
                 for n in files[:max(1, calib_images)]]
        variables = calibrate_quant_scales(model, variables, calib,
                                           log=log)
    if mesh.devices.size > 1 and batch_size % mesh.devices.size:
        batch_size = batch_size * mesh.devices.size
        log(f"data-parallel x{mesh.devices.size}: eval batch "
            f"-> {batch_size}")
    # purity accumulates over the WHOLE split inside the same eval pass
    # (ref eval_valid_multiscale.py:255-269 loops every val image)
    # proto_class follows the distance layout (active prototypes only —
    # floor-division-leftover bank rows never appear in model outputs)
    # fast_output routes the upsample+argmax through the fused Pallas
    # kernel (never materializes full-res logits; 28.8 -> 27.6 ms/img at
    # Cityscapes batch 2, benchmarks/bench_eval.py).  DEFAULT ON for TPU
    # (None = auto): the kernel's fp32 summation order could in theory
    # flip near-exact-tie argmax pixels vs the jax.image path, but the
    # measured flip count is ZERO over 35.9M pixels of realistic logits
    # on the chip and <=1e-3 is pinned on trained checkpoints
    # (tests/test_eval_cli.py).  --exact-output forces the
    # reference-exact XLA path (use it for the Zenodo mIoU-parity gate).
    evaluator = SegEvaluator(
        model, spec.num_classes, mesh=mesh,
        fast_output=fast_output is not False,
        proto_class=np.argmax(
            spec.class_identity[:spec.num_active_prototypes], axis=1))
    if fast_output and not evaluator.fast_output:
        log("--fast-output requested but unavailable off-TPU; using the "
            "XLA upsample path")
    # batch images of identical shape together (variable-size datasets
    # like ADE fall back to singleton shape buckets)
    pending_imgs, pending_anns, pending_shape = [], [], None

    def flush():
        nonlocal pending_imgs, pending_anns
        if not pending_imgs:
            return
        images = np.stack(pending_imgs)
        anns = np.stack(pending_anns)
        evaluator.update(variables, images.astype(np.float32), anns)
        pending_imgs, pending_anns = [], []

    # bounded prefetch of the disk loads/ID conversion so host IO
    # overlaps the (asynchronously dispatched) device evaluation without
    # loading the whole split ahead (full-res fp32 images are ~25 MB)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        window = deque()
        it = iter(files)
        for name in it:
            window.append(pool.submit(load_one, name))
            if len(window) >= 4:
                break
        while window:
            x, ann = window.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                window.append(pool.submit(load_one, nxt))
            if pending_shape not in (None, (x.shape, ann.shape)) or \
                    len(pending_imgs) >= batch_size:
                flush()
            pending_shape = (x.shape, ann.shape)
            pending_imgs.append(x)
            pending_anns.append(ann)
    flush()

    try:
        _save_sample_artifacts(
            model, spec, variables, files, img_dir, ann_dir, data_type,
            margin, out_dir, log)
    except Exception as e:  # artifacts are best-effort
        log(f"eval artifacts skipped: {e}")

    result = evaluator.result()
    # the primary outputs (scores + mean) are written FIRST: plotting /
    # artifact failures must never lose the result of a full-split eval
    names = class_names(data_type, spec.num_classes)
    iou_scores = {names[i]: result["per_class_iou"][i]
                  for i in range(spec.num_classes)}
    with open(os.path.join(out_dir, "iou_scores.json"), "w") as f:
        json.dump(iou_scores, f, indent=2)
    with open(os.path.join(out_dir, "mean_iou.txt"), "w") as f:
        f.write(f"{result['mean_iou']}\n")
    try:
        if "top_k_purity_percent" in result:
            _save_purity_artifacts(result["top_k_purity_percent"],
                                   result["purity_images"], out_dir, log)
        _save_plots(out_dir, iou_scores, variables, spec)
    except Exception as e:  # artifacts are best-effort
        log(f"eval plot artifacts skipped: {e}")
    log(f"mean IoU: {result['mean_iou']:.4f}  "
        f"pixel acc: {result['pixel_accuracy']:.4f}")
    return result


def purity_curve_update(dists_grid: np.ndarray, logits_grid: np.ndarray,
                        proto_class: np.ndarray, label_shape,
                        rng: np.random.Generator,
                        n_random_pixels: int = 100) -> np.ndarray:
    """One image's contribution to the top-K purity curve
    (ref eval_valid_multiscale.py:255-269): at ``n_random_pixels`` random
    LABEL-RESOLUTION pixels, the fraction of the K nearest prototypes
    (distances bilinearly upsampled to label resolution, over the whole
    bank) whose class equals the pixel's prediction, for every K, in
    percent.  The upsampled values are evaluated pointwise
    (``bilinear_sample_np``) instead of materializing the full label-res
    distance volume the reference interpolates.

    Returns a (P,) array: mean over the sampled pixels x 100.
    """
    from scaleprotoseg_tpu.ops.resize import bilinear_sample_np

    out_h, out_w = int(label_shape[0]), int(label_shape[1])
    rows = rng.integers(0, out_h, size=n_random_pixels)
    cols = rng.integers(0, out_w, size=n_random_pixels)
    sample_d = bilinear_sample_np(dists_grid, rows, cols, out_h, out_w)
    sample_logits = bilinear_sample_np(logits_grid, rows, cols, out_h,
                                       out_w)
    sample_preds = np.argmax(sample_logits, axis=-1)         # (n,)
    order = np.argsort(sample_d, axis=-1)                     # (n, P)
    is_class_proto = proto_class[order] == sample_preds[:, None]
    k = np.arange(1, order.shape[1] + 1, dtype=np.float64)
    frac = np.cumsum(is_class_proto, axis=1) / k[None]        # (n, P)
    return frac.mean(axis=0) * 100.0


def _save_sample_artifacts(model, spec, variables, files, img_dir,
                           ann_dir, data_type, margin, out_dir, log,
                           n_samples: int = 5):
    """Sample visualizations (ref eval_valid_multiscale.py:336-410).
    Decoupled from the purity curve, which now streams over the whole
    split inside the main eval pass (SegEvaluator)."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from scaleprotoseg_tpu.ops.resize import resize_label_nearest_np

    @jax.jit
    def forward(variables, image):
        out = model.apply(variables, image, train=False)
        return out.logits

    sample_dir = os.path.join(out_dir, "samples")
    os.makedirs(sample_dir, exist_ok=True)

    for name in files[:n_samples]:
        img = np.load(os.path.join(img_dir, name + ".npy"))
        if margin:
            img = img[margin:-margin, margin:-margin]
        ann = np.load(os.path.join(ann_dir, name + ".npy"))
        if ann.ndim == 3:
            ann = ann[..., 0]
        ann = convert_targets(ann, data_type).astype(np.int64)
        x = _prepare_image(img, ann.shape, data_type)
        logits = jax.device_get(
            forward(variables, jnp.asarray(x)[None].astype(np.float32)))
        pred = np.argmax(logits[0], -1)
        t = resize_label_nearest_np(ann, (pred.shape[1], pred.shape[0]))
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        axes[0].imshow(img)
        axes[0].set_title("input")
        axes[1].imshow(t, cmap="tab20")
        axes[1].set_title("ground truth")
        axes[2].imshow(pred + 1, cmap="tab20")
        axes[2].set_title("prediction")
        for ax in axes:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(sample_dir, f"{name}.png"), dpi=90)
        plt.close(fig)


def _save_purity_artifacts(curve, n_images, out_dir, log):
    """proto_purity.json + the top-K purity plot
    (ref eval_valid_multiscale.py:300-311), from the full-split
    accumulation done on device by SegEvaluator."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(os.path.join(out_dir, "proto_purity.json"), "w") as f:
        json.dump({"top_k_purity_percent": list(curve),
                   "n_images": int(n_images)}, f, indent=2)
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(curve)
    ax.set_xlabel("Nearest K prototypes to a pixel")
    ax.set_ylabel("% of K prototypes from pixel class")
    ax.set_ylim(0, 100)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "class_prototypes_in_nearest_k.png"),
                dpi=110)
    plt.close(fig)
    log(f"top-1 prototype purity over {n_images} images: "
        f"{curve[0]:.2f}%")


def _save_plots(out_dir: str, iou_scores: dict, variables, spec):
    """Per-class IoU bar chart + same-class prototype distance histograms
    (ref eval_valid_multiscale.py:105-162, 283-297)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    fig, ax = plt.subplots(figsize=(max(6, len(iou_scores) * 0.4), 4))
    ax.bar(list(iou_scores), list(iou_scores.values()))
    ax.set_ylabel("IoU")
    plt.xticks(rotation=90)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "iou_per_class.png"), dpi=120)
    plt.close(fig)

    pv = np.asarray(variables["params"]["prototype_vectors"])
    dists = []
    identity = spec.class_identity
    for c in range(spec.num_classes):
        idx = np.nonzero(identity[:, c])[0]
        if len(idx) < 2:
            continue
        p = pv[idx]
        d = ((p[:, None] - p[None]) ** 2).sum(-1)
        dists.extend(d[np.triu_indices(len(idx), 1)].tolist())
    if dists:
        fig, ax = plt.subplots()
        ax.hist(dists, bins=50)
        ax.set_xlabel("same-class prototype squared L2 distance")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "proto_distance_hist.png"),
                    dpi=120)
        plt.close(fig)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("batch_size", nargs="?", type=int, default=2)
    p.add_argument("data_type", nargs="?", default="cityscapes")
    p.add_argument("--margin", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--shape-multiple", type=int, default=None,
                   help="round variable eval shapes to this multiple "
                   "(fewer XLA compiles; default 64 for ade, exact "
                   "otherwise; 0 forces the reference-exact protocol)")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--fast-output", dest="fast_output",
                   action="store_true", default=None,
                   help="fused Pallas upsample+argmax prediction path "
                   "(default on TPU; 0 argmax flips measured over 35.9M "
                   "pixels — benchmarks/bench_eval.py)")
    g.add_argument("--exact-output", dest="fast_output",
                   action="store_false",
                   help="force the reference-exact XLA upsample path "
                   "(the Zenodo mIoU-parity protocol)")
    q = p.add_mutually_exclusive_group()
    q.add_argument("--quant8-static", dest="quant8", action="store_const",
                   const="static", default=False,
                   help="evaluate the calibrated-int8 serving path "
                   "(PTQ layer4/5, scales calibrated on the first "
                   "--calib-images val images) — results land in "
                   "evaluation/<phase>-quant8static so the mIoU delta "
                   "vs the bf16 dir is the deployment accuracy cost")
    q.add_argument("--quant8", dest="quant8", action="store_true",
                   help="evaluate the dynamic w8a8 int8 path (the "
                   "calibration-free memory knob; forces the XLA "
                   "output path — see ops/quant.py)")
    p.add_argument("--calib-images", type=int, default=8,
                   help="calibration images for --quant8-static")
    p.add_argument("--fp32", action="store_true",
                   help="evaluate with the fp32/XLA forward (the "
                   "reference evals in fp32; with --exact-output this "
                   "is the fully reference-exact Zenodo mIoU protocol; "
                   "default bf16 is the speed path)")
    a = p.parse_args()
    run_evaluation(a.model_name, a.training_phase, a.batch_size,
                   a.data_type, margin=a.margin, limit=a.limit,
                   data_root=a.data_root, fast_output=a.fast_output,
                   shape_multiple=a.shape_multiple, quant8=a.quant8,
                   calib_images=a.calib_images, fp32=a.fp32)


if __name__ == "__main__":
    main()
