"""k-nearest training patches per prototype.

TPU redesign of `find_nearest.find_k_nearest_patches_to_prototypes`
(ref find_nearest.py:71-352): the reference keeps per-prototype Python
heaps fed by batch-1 forwards; here one jitted batched pass emits each
image's (void-masked) min distance + argmin per prototype and the host
merges a running top-k (k nearest come from k *different* images, one
candidate per image, exactly like the reference's heap-per-image push).

Patch label rule (ref :206-216): the prototype-grid cell maps to a
(patch_h x patch_w) region of the full-res (converted, -1-shifted)
annotation; if any pixel equals the prototype's class the label is that
class, else the region's most common value.

``full_save`` writes per-prototype artifacts: the activation map
(``nearest-{i}_act.npy``), the original image, the patch crop, and a
bbox overlay (``nearest-{i}*.png``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.prototype import (distance_to_similarity,
                                             pad_minima_to_bank)
from scaleprotoseg_tpu.ops.resize import resize_label_nearest
from scaleprotoseg_tpu.spec import ProtoSpec

VOID_PENALTY = 10e6


def _make_void_min_step(model, spec: ProtoSpec, k: int):
    # Per-image minima are padded from the distance layout back to bank
    # width with +inf: dangling floor-division-leftover bank rows never
    # collect nearest patches (they are absent from forward).
    @jax.jit
    def step(variables, images, targets):
        feats, distances = model.apply(variables, images,
                                       method="push_forward")
        h, w = distances.shape[1], distances.shape[2]
        t = resize_label_nearest(targets, h, w).astype(jnp.int32) - 1
        masked = distances + VOID_PENALTY * (t < 0)[..., None]
        flat = jnp.swapaxes(
            masked.reshape(masked.shape[0], -1, masked.shape[-1]), 1, 2)
        vals, idxs = pad_minima_to_bank(jnp.min(flat, -1),
                                        jnp.argmin(flat, -1), spec)
        # per-batch top-k ON DEVICE (one candidate per image, like the
        # reference's heap push): outputs are (P, min(k, B)) and
        # replicated under batch sharding, so the scan works in
        # multi-process execution and the host merge touches k rows per
        # batch instead of every image
        kk = min(k, vals.shape[0])
        neg, rows = jax.lax.top_k(-vals.T, kk)              # (P, kk)
        flat_k = jnp.take_along_axis(idxs.T, rows, axis=1)
        return (-neg, rows.astype(jnp.int32), flat_k,
                jnp.asarray(distances.shape[1:3]))

    return step


def _patch_label(ann_minus1: np.ndarray, gi: int, gj: int, grid_h: int,
                 grid_w: int, target_class: int) -> int:
    ih, iw = ann_minus1.shape
    ph, pw = ih / grid_h, iw / grid_w
    h0, h1 = int(gi * ph), int((gi + 1) * ph)
    w0, w1 = int(gj * pw), int((gj + 1) * pw)
    region = ann_minus1[h0:h1, w0:w1]
    if region.size == 0:
        return -1
    if np.any(region == target_class):
        return int(target_class)
    values, counts = np.unique(region, return_counts=True)
    return int(values[np.argmax(counts)])


def find_k_nearest_patches_to_prototypes(
        push_loader, model, variables, spec: ProtoSpec, k: int = 6,
        full_save: bool = False,
        root_dir_for_saving_images: Optional[str] = None,
        mesh=None, log=print) -> np.ndarray:
    """Returns (P, k) class ids of the k nearest patches per prototype.

    ``mesh``: optional data mesh — shards each batch's image axis so the
    full-split scan runs data-parallel (same pattern as push).
    """
    P = spec.num_prototypes
    step = _make_void_min_step(model, spec, k)
    proto_class = np.argmax(spec.class_identity, axis=1)

    def place(images, targets):
        if mesh is not None and mesh.devices.size > 1:
            # multi-process: identical full-order loader on every
            # process, each contributes its block (same contract as
            # push_prototypes; == shard_batch single-process)
            from scaleprotoseg_tpu.parallel import split_global_batch
            return split_global_batch((np.asarray(images),
                                       np.asarray(targets)), mesh)
        return jnp.asarray(images), jnp.asarray(targets)

    # running top-k per prototype (dist, img, flat)
    top_d = np.full((P, k), np.inf)
    top_img = np.full((P, k), -1, np.int64)
    top_flat = np.zeros((P, k), np.int64)
    grid_shape = None

    offset = 0

    # buffered bulk fetches keep the device scan dispatching ahead of the
    # host top-k maintenance (same pattern as the train/eval loops)
    def fold(item):
        nonlocal top_d, top_img, top_flat, grid_shape
        off, (vals, rows, flats, gshape) = item
        grid_shape = tuple(int(v) for v in gshape)
        cand_d = np.concatenate([top_d, np.asarray(vals)], axis=1)
        cand_img = np.concatenate(
            [top_img, off + np.asarray(rows, np.int64)], axis=1)
        cand_flat = np.concatenate([top_flat, np.asarray(flats, np.int64)],
                                   axis=1)
        order = np.argsort(cand_d, axis=1)[:, :k]
        top_d = np.take_along_axis(cand_d, order, 1)
        top_img = np.take_along_axis(cand_img, order, 1)
        top_flat = np.take_along_axis(cand_flat, order, 1)

    from scaleprotoseg_tpu.parallel import BulkFetcher
    fetcher = BulkFetcher(fold, limit=16)
    for images, targets in push_loader:
        fetcher.add((offset, step(variables, *place(images, targets))))
        offset += images.shape[0]
    fetcher.drain()
    log(f"find_nearest: scanned {offset} images, grid {grid_shape}")

    # Second pass: fetch only the (<= P*k unique) winner annotations.
    needed = set(int(i) for i in np.unique(top_img) if i >= 0)
    ann_cache = {}
    offset = 0
    for _, targets in push_loader:
        for b in range(targets.shape[0]):
            if offset + b in needed:
                ann_cache[offset + b] = np.asarray(targets[b])
        offset += targets.shape[0]
        if len(ann_cache) == len(needed):
            break

    gh, gw = grid_shape
    labels = np.full((P, k), -1, np.int64)
    for p in range(P):
        for i in range(k):
            if top_img[p, i] < 0 or not np.isfinite(top_d[p, i]):
                continue
            ann = ann_cache[int(top_img[p, i])].astype(np.int64) - 1
            gi, gj = divmod(int(top_flat[p, i]), gw)
            labels[p, i] = _patch_label(ann, gi, gj, gh, gw,
                                        proto_class[p])

    # one writer: every process holds the identical replicated top-k,
    # and the artifact pass is collective-free -> process 0 writes
    if full_save and root_dir_for_saving_images and \
            jax.process_index() == 0:
        _save_artifacts(push_loader, model, variables, spec, top_d,
                        top_img, top_flat, grid_shape,
                        root_dir_for_saving_images, log)
    return labels


def _save_artifacts(push_loader, model, variables, spec, top_d, top_img,
                    top_flat, grid_shape, root_dir, log):
    """Per-prototype nearest-patch visualization artifacts
    (ref find_nearest.py:245-340)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    @jax.jit
    def distances_of(variables, images):
        _, d = model.apply(variables, images, method="push_forward")
        return d

    winners = sorted(set(int(i) for i in np.unique(top_img) if i >= 0))
    gh, gw = grid_shape
    P, k = top_d.shape
    by_winner = {}
    for p in range(P):
        for i in range(k):
            w = int(top_img[p, i])
            if w >= 0 and np.isfinite(top_d[p, i]):
                by_winner.setdefault(w, []).append((p, i))

    offset = 0
    for images, _ in push_loader:
        batch_winners = [w for w in range(offset, offset + images.shape[0])
                         if w in by_winner]
        if batch_winners:
            d = np.asarray(jax.device_get(
                distances_of(variables, jnp.asarray(images))))
            for w in batch_winners:
                img = np.asarray(images[w - offset])
                dist_map = d[w - offset]                     # (gh, gw, P)
                ih, iw = img.shape[:2]
                ph, pw = ih / gh, iw / gw
                # de-normalize for display
                disp = img * np.array([0.229, 0.224, 0.225]) + \
                    np.array([0.485, 0.456, 0.406])
                disp = np.clip(disp, 0, 1)
                for (p, i) in by_winner[w]:
                    out_dir = os.path.join(root_dir, str(p))
                    os.makedirs(out_dir, exist_ok=True)
                    act = np.asarray(distance_to_similarity(
                        jnp.asarray(dist_map[:, :, p])))
                    np.save(os.path.join(out_dir,
                                         f"nearest-{i + 1}_act.npy"), act)
                    plt.imsave(os.path.join(
                        out_dir, f"nearest-{i + 1}_original.png"), disp)
                    gi, gj = divmod(int(top_flat[p, i]), gw)
                    h0, h1 = int(gi * ph), max(int((gi + 1) * ph),
                                               int(gi * ph) + 1)
                    w0, w1 = int(gj * pw), max(int((gj + 1) * pw),
                                               int(gj * pw) + 1)
                    plt.imsave(os.path.join(
                        out_dir, f"nearest-{i + 1}_patch.png"),
                        disp[h0:h1, w0:w1])
                    fig, ax = plt.subplots()
                    ax.imshow(disp)
                    ax.add_patch(plt.Rectangle((w0, h0), w1 - w0, h1 - h0,
                                               fill=False, color="yellow",
                                               linewidth=2))
                    ax.axis("off")
                    fig.savefig(os.path.join(
                        out_dir, f"nearest-{i + 1}_bbox.png"),
                        bbox_inches="tight", dpi=100)
                    plt.close(fig)
        offset += images.shape[0]
