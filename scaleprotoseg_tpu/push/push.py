"""Prototype push (projection) as batched on-device scans.

The reference's optimized push (`push_multiscale_optimization.py:193-338`)
runs the whole train split at batch 1, masks each prototype's distance
map to its own-class non-void pixels, takes per-image minima, then
re-encodes each winning image once *per prototype* (up to P re-encodes,
SURVEY.md §3.3).  TPU-native redesign:

1. one jitted batched pass over the dataset computes per-image masked
   minima for all prototypes at once — (B, P) values + flat argmins;
2. a global argmin over images picks each prototype's winner;
3. each *unique* winning image is re-encoded exactly once (batched), and
   all of its prototypes' feature vectors are gathered from that single
   forward — not one forward per prototype.

After projection, exact-duplicate prototypes are pruned
(``np.unique``, ref :327-335) and ``unique_prototypes.json`` plus a
``push_info.npz`` record (winner image / pixel / scale / distance per
prototype — the bound-box source data) are written.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.prototype import pad_minima_to_bank
from scaleprotoseg_tpu.ops.resize import resize_label_nearest
from scaleprotoseg_tpu.spec import ProtoSpec

MAX_DIST = 1e10


@dataclasses.dataclass
class PushResult:
    params: Dict                     # updated (and possibly pruned) params
    spec: ProtoSpec                  # spec after dedup pruning
    kept: np.ndarray                 # indices of kept prototypes
    winners: np.ndarray              # (P,) winning image index (pre-prune)
    min_dists: np.ndarray            # (P,) winning distances (pre-prune)


def _make_min_step(model, spec: ProtoSpec):
    # Distances carry only the scale-covered (active) prototypes; the
    # per-image minima are padded back to bank width with +inf so dangling
    # bank rows (floor-division leftovers, class -1) never win and stay
    # unpushed.
    class_of_proto = jnp.asarray(
        np.array(spec.class_ids[:spec.num_active_prototypes], np.int32))

    @jax.jit
    def min_step(variables, images, targets):
        feats, distances = model.apply(variables, images,
                                       method="push_forward")
        h, w = distances.shape[1], distances.shape[2]
        t = resize_label_nearest(targets, h, w).astype(jnp.int32) - 1
        # mask: pixel belongs to the prototype's class (void never matches)
        mask = (t[..., None] == class_of_proto[None, None, None, :])
        masked = jnp.where(mask, distances, distances + MAX_DIST)
        flat = masked.reshape(masked.shape[0], -1, masked.shape[-1])
        flat = jnp.swapaxes(flat, 1, 2)            # (B, Pa, h*w)
        vals, idxs = pad_minima_to_bank(jnp.min(flat, axis=-1),
                                        jnp.argmin(flat, axis=-1), spec)
        # reduce over the batch ON DEVICE: the outputs are (P,) and —
        # crucially — replicated under batch sharding, so the scan fetches
        # 2 small rows per batch instead of (B, P) matrices AND works in
        # multi-process (multi-host) execution, where per-batch sharded
        # arrays are not host-addressable.  argmin keeps the first row
        # among ties, matching the host fold's strict-< semantics.
        row = jnp.argmin(vals, axis=0).astype(jnp.int32)         # (P,)
        cols = jnp.arange(vals.shape[1])
        return jnp.min(vals, axis=0), row, idxs[row, cols]

    return min_step


def _make_gather_step(model, spec: ProtoSpec):
    scale_of_proto = jnp.asarray(spec.scale_ids)

    @jax.jit
    def gather_step(variables, images, flat_idx, proto_ids):
        """Re-encode a batch of winner images; for each (image, prototype)
        pair gather the per-scale feature vector at the argmin pixel."""
        feats = model.apply(variables, images, method="conv_features")
        b, h, w, c = feats.shape
        d = spec.proto_depth
        feats = feats.reshape(b, h * w, spec.num_scales, d)
        scale = scale_of_proto[proto_ids]                    # (B,)
        batch_ids = jnp.arange(b)
        return feats[batch_ids, flat_idx, scale]             # (B, D)

    return gather_step


def push_prototypes(model, variables: Dict, spec: ProtoSpec, push_loader,
                    prototypes_dir: Optional[str] = None,
                    dedup: bool = True, save_artifacts: bool = False,
                    cls2name: Optional[Dict] = None, mesh=None,
                    log=print) -> PushResult:
    """Project every prototype onto its nearest same-class training patch.

    Args:
      push_loader: iterable of (images NHWC normalized, raw labels) batches
        covering the train split in a FIXED, RE-ITERABLE order — the
        winner images are collected on a second pass by running offset, so
        a shuffling or generator-style loader would silently misassign
        prototype vectors.  Enforced: ``shuffle=True`` loaders are
        refused, and every batch the second pass consumes is checked
        bit-identical (blake2b over the raw bytes) against the first
        pass's batch at the same position.
      dedup: prune exact-duplicate prototypes afterwards (ref :327-335).
      mesh: optional data mesh — the dataset scan (the push hot loop,
        SURVEY.md §3.3) shards each batch's image axis over it, so the
        full-split forward fans out data-parallel (a batch of
        ``mesh_size`` full-res images runs one image per chip).

    Precision: push always runs the config's (default fp32) XLA forward,
    even when training opted into the bf16 recipe — the pushed vectors
    are then the HIGHER-precision projection of the winning patches, and
    the recipe's bf16 train step sees a distance of ~0 + bf16 rounding
    at the pushed patch (the same rounding it applies everywhere else).
    Under the parity default both forwards are identical and the
    reference's exact-zero push property holds bit-for-bit.
    """
    if getattr(push_loader, "shuffle", False):
        raise ValueError(
            "push_prototypes requires a fixed-order loader: the winner "
            "images are re-collected by running offset on a second pass; "
            "pass a loader with shuffle=False (ref push uses the "
            "eval-ordered train_push_dataloader, data_module.py:17-80)")
    P = spec.num_prototypes
    min_step = _make_min_step(model, spec)
    gather_step = _make_gather_step(model, spec)

    def place(images, targets):
        if mesh is not None and mesh.devices.size > 1:
            # multi-process: every process iterates the SAME fixed-order
            # full-split loader (shared filesystem) and contributes its
            # block of each batch; the min-scan outputs are replicated,
            # so the host fold and both later passes see identical global
            # state on every process (split_global_batch == shard_batch
            # when single-process).
            from scaleprotoseg_tpu.parallel import split_global_batch
            return split_global_batch((np.asarray(images),
                                       np.asarray(targets)), mesh)
        return jnp.asarray(images), jnp.asarray(targets)

    best_dist = np.full((P,), np.inf, np.float64)
    best_img = np.full((P,), -1, np.int64)
    best_flat = np.zeros((P,), np.int64)
    img_offset = 0

    n_batches = 0

    # device results are buffered and fetched in bulk so the scan keeps
    # dispatching asynchronously (a device_get per batch serializes the
    # loop on the host round-trip)
    def fold(item):
        nonlocal best_dist, best_img, best_flat
        off, (vals, row, flat_idx) = item
        vals = np.asarray(vals, np.float64)
        improved = vals < best_dist         # strict <: first image wins ties
        best_dist = np.where(improved, vals, best_dist)
        best_img = np.where(improved, off + np.asarray(row), best_img)
        best_flat = np.where(improved, np.asarray(flat_idx), best_flat)

    import hashlib

    def fingerprint(images) -> tuple:
        a = np.ascontiguousarray(np.asarray(images))
        return (a.shape, str(a.dtype),
                hashlib.blake2b(a.tobytes(), digest_size=16).hexdigest())

    from scaleprotoseg_tpu.parallel import BulkFetcher
    fetcher = BulkFetcher(fold, limit=16)
    batch_prints = []
    for images, targets in push_loader:
        batch_prints.append(fingerprint(images))
        fetcher.add((img_offset,
                     min_step(variables, *place(images, targets))))
        img_offset += images.shape[0]
        n_batches += 1
    fetcher.drain()
    log(f"push: scanned {img_offset} images in {n_batches} batches")

    # Second pass: keep only the (<= P) unique winner images in memory.
    winner_set = set(int(i) for i in np.unique(best_img[best_img >= 0]))
    image_cache: Dict[int, np.ndarray] = {}
    offset = 0
    for i, (images, _) in enumerate(push_loader):
        if i >= len(batch_prints) or fingerprint(images) != batch_prints[i]:
            raise RuntimeError(
                f"push_prototypes: the loader's second pass returned a "
                f"different batch {i} than the first pass — the loader "
                "must be re-iterable in a fixed order (no shuffling, no "
                "exhausted generators), or prototype vectors would be "
                "misassigned")
        for b in range(images.shape[0]):
            if offset + b in winner_set:
                image_cache[offset + b] = np.asarray(images[b])
        offset += images.shape[0]
        if len(image_cache) == len(winner_set):
            break

    matched = best_img >= 0
    if not matched.all():
        log(f"push: WARNING {int((~matched).sum())} prototypes never "
            "matched a class pixel; left unchanged")

    # Re-encode each unique winner once; gather all its prototypes' vectors.
    new_vectors = np.array(jax.device_get(
        variables["params"]["prototype_vectors"]), np.float32)
    winners = np.unique(best_img[matched])
    protos_by_winner: Dict[int, List[int]] = {}
    for p in np.nonzero(matched)[0]:
        protos_by_winner.setdefault(int(best_img[p]), []).append(int(p))

    pairs = [(w_, p) for w_ in winners for p in protos_by_winner[int(w_)]]
    # batch pairs; images may repeat in a batch — still one forward per row,
    # but rows/batch amortize the compile and fill the MXU.
    batch = max(1, min(8, len(pairs)))
    for i in range(0, len(pairs), batch):
        chunk = pairs[i:i + batch]
        while len(chunk) < batch:
            chunk.append(chunk[-1])
        imgs = np.stack([image_cache[int(w_)] for w_, _ in chunk])
        flat = np.array([best_flat[p] for _, p in chunk], np.int64)
        pids = np.array([p for _, p in chunk], np.int32)
        vecs = np.asarray(jax.device_get(gather_step(
            variables, jnp.asarray(imgs), jnp.asarray(flat),
            jnp.asarray(pids))))
        for row, (_, p) in enumerate(pairs[i:i + batch]):
            new_vectors[p] = vecs[row]

    params = dict(variables["params"])
    params["prototype_vectors"] = jnp.asarray(new_vectors)

    # one writer per job: artifact/metadata files live on a shared
    # filesystem in multi-process runs and every process holds identical
    # (replicated) push state, so process 0 writes for all (the artifact
    # pass has no collectives — its forwards are process-local)
    is_main = jax.process_index() == 0

    if save_artifacts and prototypes_dir and is_main:
        from scaleprotoseg_tpu.push.artifacts import save_push_artifacts
        save_push_artifacts(model, variables, spec, push_loader, best_img,
                            best_flat, prototypes_dir, cls2name=cls2name,
                            log=log)

    kept = np.arange(P)
    new_spec = spec
    if dedup:
        _, unique_index = np.unique(new_vectors, axis=0, return_index=True)
        duplicates = sorted(set(range(P)) - set(int(i)
                                                for i in unique_index))
        if duplicates:
            log(f"push: removing {len(duplicates)} duplicate prototypes")
        new_spec = spec.prune(duplicates)
        kept = spec.keep_indices(duplicates)
        params = prune_model_params(params, kept, old_spec=spec,
                                    new_spec=new_spec)

    if prototypes_dir and is_main:
        os.makedirs(prototypes_dir, exist_ok=True)
        with open(os.path.join(prototypes_dir,
                               "unique_prototypes.json"), "w") as f:
            json.dump([int(i) for i in sorted(kept)], f)
        np.savez(os.path.join(prototypes_dir, "push_info.npz"),
                 best_img=best_img, best_flat=best_flat,
                 best_dist=best_dist, kept=kept,
                 scale_ids=spec.scale_ids)

    return PushResult(params=params, spec=new_spec, kept=kept,
                      winners=best_img, min_dists=best_dist)


def prune_model_params(params: Dict, keep: np.ndarray,
                       old_spec: Optional[ProtoSpec] = None,
                       new_spec: Optional[ProtoSpec] = None) -> Dict:
    """Model surgery for prototype removal (ref model_multiscale.py:400-432):
    slice the bank and the last layer's input rows.

    For grouped models the ``group_projection`` (C, G, Pc_max) columns are
    addressed through ``spec.class_proto_index``, which is re-derived from
    the pruned spec — so the kept columns must be re-packed against the new
    per-class index layout (the reference's grouped model has no surgery at
    all; this is the grouped analog of model_multiscale.py:400-432).
    ``last_layer_group`` rows are (class, group) slots, independent of
    prototype indices, and stay as-is; a class emptied by pruning has its
    group activations zeroed by ``compute_group``'s ``class_has_protos``
    mask, making its rows inert.
    """
    keep = np.asarray(keep)
    out = dict(params)
    out["prototype_vectors"] = jnp.asarray(
        np.asarray(params["prototype_vectors"])[keep])
    if "last_layer" in out:
        out["last_layer"] = jnp.asarray(
            np.asarray(params["last_layer"])[keep, :])
    if "group_projection" in out:
        if old_spec is None or new_spec is None:
            raise ValueError(
                "pruning a grouped model requires the pre- and post-prune "
                "ProtoSpec to re-pack group_projection columns")
        gp = np.asarray(params["group_projection"])   # (C, G, Pc_max_old)
        num_classes, num_groups, _ = gp.shape
        keep_set = set(int(i) for i in keep)
        new_gp = np.zeros(
            (num_classes, num_groups, max(new_spec.max_protos_per_class, 1)),
            gp.dtype)
        for c in range(num_classes):
            # Both index tables are ascending in prototype id and pruning
            # preserves relative order, so kept old columns map onto the
            # first len(kept) new columns in the same order.
            old_cols = [j for j, p in enumerate(old_spec.class_proto_index[c])
                        if p >= 0 and int(p) in keep_set]
            new_gp[c, :, :len(old_cols)] = gp[c][:, old_cols]
        out["group_projection"] = jnp.asarray(new_gp)
    return out
