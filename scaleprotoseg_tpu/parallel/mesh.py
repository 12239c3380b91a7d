"""Device mesh + sharding rules: the framework's communication backend.

The reference is strictly single-GPU (SURVEY.md §2: ``Trainer.gpus = 1``
everywhere, no NCCL/MPI anywhere); distribution is a new first-class
component here.  Design (SURVEY.md §5.8):

- one ``jax.sharding.Mesh`` with a ``data`` axis over ICI (optionally a
  leading ``dcn`` axis for multi-slice later),
- batch-data-parallel training via ``jax.jit`` with NamedSharding
  annotations: batches are sharded on ``data``, params/optimizer state
  replicated, and XLA inserts the gradient ``psum`` automatically from
  the sharding propagation (no hand-written collectives needed for DP),
- push/eval fan out as data-parallel sharded scans over the dataset.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
and feed per-host shards (``loader.py`` handles host sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

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


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
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
    conv stack)."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch with the leading dim sharded over the mesh.

    Falls back to replicated placement when the batch size does not divide
    the mesh (e.g. the reference's batch-2 configs on an 8-chip mesh run
    effectively single-chip unless the batch is scaled up)."""
    n = mesh.devices.size
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicate(mesh)

    def put(x):
        s = sharded if x.shape and x.shape[0] % n == 0 else replicated
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)
