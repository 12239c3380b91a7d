"""Device mesh + sharding rules: the framework's communication backend.

The reference is strictly single-GPU (SURVEY.md §2: ``Trainer.gpus = 1``
everywhere, no NCCL/MPI anywhere); distribution is a new first-class
component here.  Design (SURVEY.md §5.8):

- one ``jax.sharding.Mesh`` with a ``data`` axis over ICI; multi-slice
  pods add a leading ``dcn`` axis (``create_mesh_multislice``) so
  gradient reduction rides ICI within each slice and only slice-level
  partials cross the datacenter network,
- batch-data-parallel training via ``jax.jit`` with NamedSharding
  annotations: batches are sharded on ``data``, params/optimizer state
  replicated, and XLA inserts the gradient ``psum`` automatically from
  the sharding propagation (no hand-written collectives needed for DP),
- push/eval fan out as data-parallel sharded scans over the dataset.

Which parallelism axes apply to this architecture (and which don't):

- **dp** (batch): the workhorse — every config's global batch scales
  with the mesh (``cli_common.data_parallel_batch``).
- **sp** (spatial, ``create_mesh_2d``): the conv-net analog of tensor/
  sequence parallelism.  ~98% of the FLOPs are ResNet-101 convolutions,
  whose natural model-parallel axis is the image plane: H-sharding makes
  GSPMD partition every conv with halo exchanges over ICI, in the
  forward AND the backward (weight gradients psum over both axes).
  Activation memory per device scales down with the ``space`` axis, so
  windows larger than one chip's HBM train without remat.
- **tp** of the prototype head is deliberately absent: the bank is
  (P<=2184, 64) fp32 — kilobytes — and the head is <2% of FLOPs;
  sharding it would trade an all-gather for nothing.
- **pp/ep** are not applicable: no expert layers exist, and a
  single-path conv net at these sizes has no pipeline stage long enough
  to hide a bubble (the whole forward is ~10 ms).

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
and feed per-host shards (``loader.py`` handles host sharding).

Scaling model (SURVEY §5.8) — what DP costs before renting a pod slice
---------------------------------------------------------------------
Inputs measured on one v5e chip (r5, ``benchmarks/bench_configs.py``
donated recipe steps; gradient volume = joint-phase trainable params x
4 B fp32, counted from the real param tree):

  config               step ms   grads/step   per-chip batch
  scaleproto_cityscapes   31.9      180 MiB         2
  scaleproto_coco        136.6      180 MiB        10
  scaleproto_em           79.3       52 MiB         2

Link assumptions (state-of-the-art public v5e figures; re-measure on
your slice): ICI 45 GB/s per axis per direction, 2D torus within a
slice (1 axis below 16 chips); DCN ~12.5-25 GB/s aggregate per slice.

Per-step gradient all-reduce (bidirectional ring per torus axis,
2V(n-1)/n bytes per link-direction, ~n-independent):
~4.2 ms for 180 MiB on one ICI axis, ~2.1 ms once a second torus axis
exists (>=32 chips), ~1.2 ms for EM's 52 MiB.  XLA overlaps the psum
with the remaining backward (deep-layer grads reduce while shallow
layers still differentiate), so these are upper bounds on the EXPOSED
cost.  Weak-scaling efficiency within one ICI slice, worst-case
(zero overlap) -> expected (overlapped):

  chips      cityscapes        coco           em
  8 (1x8)    88% -> ~97%    97% -> ~99%    95% -> ~99%
  32 (4x8)   94% -> ~98%    98% -> ~99%    97% -> ~99%
  256 (16x16)94% -> ~98%    98% -> ~99%    97% -> ~99%

i.e. DP over ICI is essentially free at every useful scale; the
binding constraint is STATISTICAL, not communication: global batch =
per-chip batch x chips against the train-split size (cityscapes 2975
images -> 256 chips is batch 512 = 17% of the split per step; cap the
flagship at ~32 chips / global batch 64; EM's 165-image split makes
DP beyond ~4 chips pointless — use the 2D data x space mesh to scale
window size instead).  COCO (batch 10/chip, ~10x the dataset) scales
furthest.  LR: linear scaling with ~500-step warmup up to ~8x the
reference batch, square-root beyond (Adam phase optimizers); the
runner's ``apply_if_finite`` guard is the recipe's safety net.

Multislice (``create_mesh_multislice``): only slice-level partials
cross DCN, but 180 MiB over ~12.5-25 GB/s is 15-30 ms — NOT hideable
behind a 32 ms step (50-65% efficiency).  Use gin
``PatchClassificationModuleMultiScale.iter_size`` (optax MultiSteps,
already wired) to accumulate k micro-steps per update: the DCN
all-reduce amortizes to 1/k per step (k=4 -> ~80-90% at cityscapes),
and/or reduce in bf16 across DCN.  Params + Adam moments stay
replicated (~0.6 GB fp32 for the flagship — far under 16 GB HBM).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence] = None,
                axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh_multislice(n_slices: Optional[int] = None,
                           devices: Optional[Sequence] = None,
                           axis_names: Tuple[str, str] = ("dcn", "data")
                           ) -> Mesh:
    """Hierarchical (DCN x ICI) mesh for multi-slice data parallelism.

    Multi-slice TPU pods connect chips within a slice over ICI and
    slices over the datacenter network (DCN), whose per-chip bandwidth
    is an order of magnitude lower — so the slice boundary must be the
    OUTER mesh axis: batches shard over both axes (``shard_batch``
    upgrades its plain ``data`` spec automatically when it sees a
    ``dcn`` axis), and XLA's hierarchical collectives then reduce
    gradients within each slice over ICI first, exchanging only the
    slice-level partial sums over DCN.

    On real multi-slice hardware (devices expose ``slice_index``) the
    grouping follows the topology; on single-slice or virtual-CPU
    meshes ``n_slices`` splits the device list evenly in order — the
    semantics (this module's DP trajectory guarantees) are identical,
    only the collective routing differs.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) > 1:
        by_slice: dict = {}
        for d in devices:
            by_slice.setdefault(d.slice_index, []).append(d)
        rows = [by_slice[s] for s in sorted(by_slice)]
        if len({len(r) for r in rows}) != 1:
            raise ValueError("uneven devices per slice: "
                             f"{sorted((s, len(r)) for s, r in by_slice.items())}")
        if n_slices is not None and n_slices != len(rows):
            raise ValueError(f"n_slices={n_slices} but the topology "
                             f"has {len(rows)} slices")
        grid = np.asarray(rows)
    else:
        if not n_slices or n_slices < 2:
            raise ValueError("single-slice topology: pass n_slices >= 2 "
                             "to split the device list (or use "
                             "create_mesh for a flat data axis)")
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices do not divide "
                             f"into {n_slices} slices")
        grid = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis_name="data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis.

    On a multi-slice mesh (``create_mesh_multislice``) a plain ``data``
    request upgrades to ``(dcn, data)`` so the batch spreads over every
    device — the ``dcn`` axis is outer data parallelism, not a model
    axis."""
    if axis_name == "data" and "dcn" in mesh.axis_names:
        axis_name = ("dcn", "data")
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the height dimension of NHWC images across the mesh.

    For full-image inference larger than one chip (e.g. 1024x2048
    Cityscapes eval on small chips), jitting the forward with the input
    height-sharded makes XLA SPMD partition every convolution with
    automatic halo exchanges over ICI — no manual collectives
    (SURVEY.md §5 "long-context" equivalent: spatial partitioning of the
    conv stack).

    NOTE: use the XLA ASPP path (``fast_aspp=False``, the default) with
    spatial sharding — the fused Pallas ASPP declares only a BATCH-dim
    partitioning rule (``ops/pallas_aspp.fused_aspp_sharded``): batch-
    sharded eval/training compose with the fused kernel, but an
    H-sharded input would be replicated around it (halo reads span H),
    so spatially-sharded inference must keep the XLA form, which GSPMD
    partitions with automatic halo exchanges."""
    return NamedSharding(mesh, P(None, axis_name))


def create_mesh_2d(n_data: int, n_space: int,
                   devices: Optional[Sequence] = None,
                   axis_names: Tuple[str, str] = ("data", "space")) -> Mesh:
    """(n_data, n_space) mesh for combined batch + spatial parallelism.

    Training over it: shard images/targets with ``spatial_batch_sharding``
    and jit the unchanged train step — GSPMD partitions every conv with
    halo exchanges along ``space`` (forward and backward) and reduces
    gradients over both axes.  Lay ``space`` innermost so its halo
    exchanges ride neighbor ICI links."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_space
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_space),
                axis_names)


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch on the ``data`` axis, image height on ``space``: for NHWC
    images and (B, H, W) targets alike (dim 0 = batch, dim 1 = height)."""
    return NamedSharding(mesh, P(*mesh.axis_names[:2]))


def shard_batch_2d(batch, mesh: Mesh):
    """Device-put (image, target, ...) leaves with batch sharded on
    ``data`` and height on ``space``.

    Requires both divisibilities (B % n_data, H % n_space) — spatial
    sharding of an indivisible height would silently pad the halo math,
    so this raises instead (crop or pad the window to a multiple)."""
    n_data, n_space = (mesh.shape[a] for a in mesh.axis_names[:2])
    sh = spatial_batch_sharding(mesh)

    def put(x):
        if x.ndim < 2:
            return jax.device_put(x, replicate(mesh))
        if x.shape[0] % n_data or x.shape[1] % n_space:
            raise ValueError(
                f"shape {x.shape} does not divide the ({n_data}, "
                f"{n_space}) data x space mesh on (batch, height)")
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def assemble_global_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-process ``shard_batch``: each process passes its LOCAL rows
    of the global batch and gets back global jax.Arrays sharded on the
    data axis (global batch = local_batch x process_count).

    Row layout: process p's rows occupy the contiguous global block
    ``[p*local, (p+1)*local)`` — i.e. a per-host loader shard
    (``DataLoader(host_id=p, num_hosts=n)``) feeding a process-ordered
    mesh, the layout the two-process rehearsal replays single-process.
    Single-process meshes fall through to ``shard_batch`` so callers can
    use this unconditionally."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis_name)
    sh = batch_sharding(mesh, axis_name)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if not x.ndim:
            raise ValueError("cannot assemble a scalar; replicate it")
        if (x.shape[0] * nproc) % mesh.devices.size:
            # unlike split_global_batch there is no replicated fallback:
            # each process holds only ITS rows, so an indivisible global
            # batch cannot be rebuilt everywhere — the loaders must
            # yield fixed-size local batches (cli_common.make_loaders
            # host-shards with drop_last under multi-process)
            raise ValueError(
                f"global batch {x.shape[0] * nproc} (local {x.shape[0]} "
                f"x {nproc} processes) does not divide the "
                f"{mesh.devices.size}-device mesh; use fixed-size "
                "batches (DataLoader drop_last=True)")
        return jax.make_array_from_process_local_data(
            sh, x, (x.shape[0] * nproc,) + x.shape[1:])

    return jax.tree.map(put, batch)


def split_global_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-process ``shard_batch`` for IDENTICAL global batches: every
    process holds the same full batch (e.g. push's fixed-order full-split
    loader read from a shared filesystem) and contributes its own
    contiguous block of rows.  Single-process: ``shard_batch``.

    A batch that does not divide the mesh (the ragged tail of a real
    split — e.g. Cityscapes' 2975 push images on an 8-device mesh) falls
    back to REPLICATED placement, mirroring ``shard_batch``'s fallback:
    every process holds the identical full batch, so each device simply
    computes all rows redundantly (same replicated outputs, one extra
    compile for the tail shape)."""
    nproc = jax.process_count()
    if nproc == 1:
        return shard_batch(batch, mesh, axis_name)
    pid = jax.process_index()
    n = mesh.devices.size

    def cut(x):
        x = np.asarray(x)
        if x.shape[0] % n:
            key = (x.shape, n, "split")
            if key not in _REPLICATION_WARNED:
                _REPLICATION_WARNED.add(key)
                import logging
                logging.getLogger(__name__).warning(
                    "split_global_batch: batch of shape %s cannot shard "
                    "over the %d-device mesh — replicating (ragged tail "
                    "batches are expected at the end of a split)",
                    x.shape, n)
            return jax.make_array_from_process_local_data(
                replicate(mesh), x, x.shape)
        k = x.shape[0] // nproc
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, axis_name), x[pid * k:(pid + 1) * k],
            x.shape)

    return jax.tree.map(cut, batch)


_REPLICATION_WARNED = set()


def shard_batch(batch, mesh: Mesh, axis_name: str = "data",
                strict: bool = False):
    """Device-put a host batch with the leading dim sharded over the mesh.

    When the batch size does not divide the mesh (e.g. the reference's
    batch-2 configs on an 8-chip mesh) the array falls back to replicated
    placement — the step then runs the full batch on EVERY device, i.e.
    zero data-parallel speedup.  That fallback is loudly logged once per
    shape (and raises when ``strict=True``); the trainers avoid it by
    scaling the global batch to ``config_batch * mesh_size``
    (``cli_common.data_parallel_batch``)."""
    n = mesh.devices.size
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicate(mesh)

    def put(x):
        if x.shape and x.shape[0] % n == 0:
            return jax.device_put(x, sharded)
        if n > 1 and x.shape:
            key = (x.shape, n)
            if strict:
                raise ValueError(
                    f"batch dim {x.shape[0]} does not divide the "
                    f"{n}-device mesh; scale the global batch "
                    f"(cli_common.data_parallel_batch) or pad")
            if key not in _REPLICATION_WARNED:
                _REPLICATION_WARNED.add(key)
                import logging
                logging.getLogger(__name__).warning(
                    "shard_batch: array of shape %s cannot shard over the "
                    "%d-device mesh — REPLICATING (no data-parallel "
                    "speedup). Scale the global batch to a multiple of "
                    "the mesh size.", x.shape, n)
        return jax.device_put(x, replicated)

    return jax.tree.map(put, batch)
