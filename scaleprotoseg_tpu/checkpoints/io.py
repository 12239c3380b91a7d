"""Checkpoint serialization.

The reference pickles whole Lightning modules (``torch.save(obj=ppnet)``,
`module_multiscale.py:348` — noted as fragile in SURVEY.md §5).  Here
checkpoints are a documented schema: a msgpack-serialized pytree (flax
serialization) plus a JSON sidecar describing the spec/config, written
atomically.  Stage names mirror the reference
(``{warmup|nopush|push}[-group]_{last,best}``, ``push_final``,
``final-group``) with a ``.ckpt`` extension.

Orbax async checkpointing can be layered on later for multi-host; this
format is the single-file interchange the converter and eval tools use.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _spec_meta(spec) -> Dict[str, Any]:
    return {
        "num_classes": spec.num_classes,
        "num_scales": spec.num_scales,
        "proto_depth": spec.proto_depth,
        "num_groups": spec.num_groups,
        "class_ids": list(spec.class_ids),
        "scale_bounds": [list(b) for b in spec.scale_bounds],
    }


def spec_from_meta(meta: Dict[str, Any]):
    from scaleprotoseg_tpu.spec import ProtoSpec
    return ProtoSpec(
        num_classes=meta["num_classes"], num_scales=meta["num_scales"],
        proto_depth=meta["proto_depth"], num_groups=meta["num_groups"],
        class_ids=tuple(meta["class_ids"]),
        scale_bounds=tuple(tuple(b) for b in meta["scale_bounds"]))


def save_checkpoint(path: str, params, batch_stats=None, spec=None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomically write {params, batch_stats} + JSON metadata.

    One writer per job: under multi-process execution only process 0
    writes (params are replicated; concurrent writers would race on the
    same shared-filesystem tmp path and corrupt the file).  Unlike the
    Orbax state save this is NOT a collective — gating it here is safe
    and keeps every call site (trainers, push, converters) single-writer
    without changes."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats or {}),
    }
    blob = serialization.msgpack_serialize(payload)
    meta = {"format": "scaleprotoseg_tpu/v1"}
    if spec is not None:
        meta["spec"] = _spec_meta(spec)
    if extra:
        meta["extra"] = extra
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=repr)


def load_checkpoint(path: str) -> Tuple[Dict, Dict, Dict]:
    """Returns (params, batch_stats, meta)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return payload["params"], payload.get("batch_stats", {}), meta
