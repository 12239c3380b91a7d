"""AOT export of the inference forward to a portable StableHLO artifact.

``jax.export`` lowers the jitted forward once and serializes the
resulting StableHLO module with a versioned calling convention; a
serving host deserializes and runs it without the model definition,
the gin config stack, or tracing.  Weights are NOT baked into the
module as constants — the exported function takes ``(variables, x)``,
and the artifact directory carries the weights in the repo's standard
checkpoint format (`checkpoints/io.py`), so the module stays small and
the same artifact can be re-pointed at pushed/pruned weights of the
same shape.

Artifact layout (a directory)::

    module.bin         jax.export serialized bytes (StableHLO + vjp-free
                       calling convention)
    weights.ckpt[.json] params/batch_stats (checkpoints.io format)
    meta.json          input spec, output kind, platforms, model info

Batch handling: ``batch=None`` exports with a symbolic batch dimension
(``jax.export.symbolic_shape``) so one artifact serves any batch size;
a fixed ``batch`` pins it and additionally allows the fused Pallas
head/ASPP fast path (``fast=True``), whose kernel grids need static
shapes.  The reference's counterpart surface is the eval forward of
`segmentation/eval_valid_multiscale.py:118-131` (logits upsampled to
input resolution, argmax over classes).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                              save_checkpoint,
                                              spec_from_meta)
from scaleprotoseg_tpu.ops.resize import resize_bilinear_matrix

_FORMAT = "scaleprotoseg_tpu/serving/v1"


def make_serving_fn(model, *, output: str = "labels",
                    upsample: bool = True, fast: bool = False,
                    normalize_to=None):
    """The inference forward to export: ``fn(variables, x) -> labels``.

    ``output='labels'`` argmaxes on device and ships uint8 (B, H, W) —
    1 byte of host transfer per ~320 of fp32 logits (int32 when the
    model has >255 classes; no reference dataset does); ``'logits'``
    returns the fp32 (B, h, w, C) map pre-argmax (pre-upsample unless
    ``upsample``).  ``fast`` routes through the fused Pallas head (TPU
    only, static batch only) and fuses the label upsample+argmax into
    one kernel that never materializes the full-res logits
    (`ops/pallas_upsample.py`).

    ``normalize_to`` moves input normalization onto the device: the
    returned fn takes RAW uint8 RGB and computes
    ``((x / 255) - IMAGENET_MEAN) / IMAGENET_STD`` in fp32 — the same
    fp32 ops as the host pipeline (`serve._make_preprocess`), so the
    result is bit-identical — then casts to this dtype for the model.
    Cuts host->device transfer 4x (uint8 vs fp32) and removes the
    per-image host float pass, which is what bounds streaming
    throughput on thin serving hosts (`benchmarks/bench_serving.py`).

    DYNAMIC-quant8 backbones silently drop ``fast``: the per-conv
    dynamic quantize flips XLA's activation layouts, and ANY downstream
    Pallas custom call (fused head or upsample) then constrains its
    operand layout, forcing a relayout measured at a 3x whole-model
    cliff on v5e (318 ms vs 105 at batch 4 — re-confirmed round 4 with
    clean syncs).  STATIC-quant8 backbones compose fine — no cliff —
    and static + the full fast path is the fastest serving config
    measured (40.5 img/s vs 38.0 bf16-fast, labels identical on the
    probe batch; benchmarks/bench_quant_static2.py).
    """
    if output not in ("labels", "logits"):
        raise ValueError(f"output must be labels|logits, got {output!r}")
    if getattr(model.backbone, "quant8", False) is True:   # dynamic only
        fast = False
    if normalize_to is not None:
        from scaleprotoseg_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def fn(variables, x):
        if (getattr(model.backbone, "quant8", False) == "static"
                and "quant_scales" not in variables):
            raise ValueError(
                "quant8='static' model served without calibrated "
                "scales: run model_loading.calibrate_quant_scales "
                "first (the serve CLI's --quant8-static does this on "
                "the first inputs)")
        if normalize_to is not None:
            x = ((x.astype(jnp.float32) / 255.0 - mean) / std).astype(
                normalize_to)
        if fast:
            logits = model.apply(variables, x, method="fast_logits")
        else:
            logits = model.apply(variables, x, train=False).logits
        if output == "labels":
            ldtype = jnp.uint8 if logits.shape[-1] <= 255 else jnp.int32
            if upsample and fast:
                from scaleprotoseg_tpu.ops.pallas_upsample import (
                    fused_upsample_argmax_sharded)
                labels = fused_upsample_argmax_sharded(
                    logits, x.shape[1], x.shape[2])
            else:
                if upsample:
                    logits = resize_bilinear_matrix(
                        logits, x.shape[1], x.shape[2])
                labels = jnp.argmax(logits, axis=-1)
            return labels.astype(ldtype)
        if upsample:
            # matrix-form upsample: the jax.image lowering of the
            # full-res fp32 resize is both slower and wholly
            # materialized; the einsum form is the same grid at
            # fp32-roundoff parity (ops/resize.py)
            logits = resize_bilinear_matrix(logits, x.shape[1],
                                            x.shape[2])
        return logits

    return fn


def make_mesh_predict(model, variables, mesh, *, output: str = "labels",
                      upsample: bool = True, fast: bool = False,
                      normalize_to=None):
    """Data-parallel serving over a device mesh: ``predict(x)``.

    Params replicate, the batch shards on the mesh's leading axis, and
    XLA SPMD partitions the whole forward — the fused Pallas ASPP ships
    its own batch partitioning rule (`ops/pallas_aspp.fused_aspp_sharded`),
    so ``fast=True`` composes with the mesh.  The returned callable
    accepts host numpy batches (the jit's in_shardings place them) and
    dispatches asynchronously, so it drops into ``ServingEngine``
    unchanged.  Batch must divide the mesh size — serving replication
    would silently waste every chip but one, so this raises instead.
    """
    from scaleprotoseg_tpu.parallel.mesh import batch_sharding, replicate

    fn = make_serving_fn(model, output=output, upsample=upsample,
                         fast=fast, normalize_to=normalize_to)
    rep = replicate(mesh)
    shard = batch_sharding(mesh)
    jfn = jax.jit(fn,
                  in_shardings=(jax.tree.map(lambda _: rep, variables),
                                shard),
                  out_shardings=shard)
    variables = jax.device_put(variables, rep)
    n = mesh.devices.size

    def predict(x):
        if x.shape[0] % n:
            raise ValueError(
                f"serving batch {x.shape[0]} does not divide the "
                f"{n}-device mesh — pick a batch that is a multiple")
        return jfn(variables, x)

    return predict


def export_serving(model, variables, *, height: int, width: int,
                   batch: Optional[int] = None,
                   input_dtype=jnp.bfloat16,
                   output: str = "labels", upsample: bool = True,
                   fast: bool = False,
                   platforms: Optional[Sequence[str]] = None,
                   device_preprocess: bool = False):
    """Lower + serialize the forward; returns ``jax.export.Exported``.

    ``platforms=None`` exports for the current default backend only.
    ``batch=None`` uses a symbolic batch dim (incompatible with
    ``fast=True``: the Pallas kernels' grids are shape-static).
    ``device_preprocess=True`` bakes input normalization into the
    module: the artifact takes RAW uint8 RGB and normalizes on device
    (``input_dtype`` then names the post-normalize compute dtype) —
    see ``make_serving_fn(normalize_to=...)``.
    """
    from jax import export as jexport

    if fast and batch is None:
        raise ValueError("fast=True needs a fixed batch: the fused "
                         "Pallas kernels flatten B*H*W into a static "
                         "grid")
    if batch is None and getattr(model.backbone, "fast_aspp", False):
        # fast_aspp lives on the MODEL (models/deeplab.py ASPP branch),
        # not the serving-path flag: a model built by
        # load_model(fast=True) would still hit the Pallas ASPP under a
        # symbolic batch, whose block specs must be shape-static.
        import dataclasses
        model = dataclasses.replace(
            model, backbone=dataclasses.replace(model.backbone,
                                                fast_aspp=False))
    bdim = jexport.symbolic_shape("b")[0] if batch is None else batch
    wire_dtype = jnp.uint8 if device_preprocess else input_dtype
    x_spec = jax.ShapeDtypeStruct((bdim, height, width, 3), wire_dtype)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables)
    fn = make_serving_fn(model, output=output, upsample=upsample,
                         fast=fast,
                         normalize_to=input_dtype if device_preprocess
                         else None)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(var_spec, x_spec)


def save_artifact(path: str, exported, variables, spec=None,
                  extra: Optional[Dict[str, Any]] = None) -> None:
    """Write the serving artifact directory (see module docstring)."""
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "module.bin.tmp")
    with open(tmp, "wb") as f:
        f.write(exported.serialize())
    os.replace(tmp, os.path.join(path, "module.bin"))
    if "quant_scales" in variables:
        # calibrated static-quant activation scales: a small tree of
        # scalars — persisted as nested floats in the ckpt extra so the
        # artifact serves without re-calibration
        extra = dict(extra or {})
        extra["quant_scales"] = jax.tree.map(
            float, variables["quant_scales"])
    save_checkpoint(os.path.join(path, "weights.ckpt"),
                    variables.get("params", {}),
                    batch_stats=variables.get("batch_stats"),
                    spec=spec, extra=extra)
    # in_avals is the FLATTENED (variables..., x) leaf list; the image
    # input is the last leaf (fn signature is (variables, x))
    in_aval = exported.in_avals[-1]
    meta = {
        "format": _FORMAT,
        "input": {
            "shape": [None if jexport.is_symbolic_dim(d) else int(d)
                      for d in in_aval.shape],
            "dtype": jnp.dtype(in_aval.dtype).name,
            # uint8 wire dtype <=> normalization is baked into the
            # module (export_serving device_preprocess); the model
            # itself never ingests raw uint8
            "device_normalize": jnp.dtype(in_aval.dtype) == jnp.uint8,
        },
        "output": {
            "shape": [None if jexport.is_symbolic_dim(d) else int(d)
                      for d in exported.out_avals[0].shape],
            "dtype": jnp.dtype(exported.out_avals[0].dtype).name,
        },
        "platforms": list(exported.platforms),
        "extra": extra or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


@dataclasses.dataclass
class ServingModel:
    """A loaded artifact: ``predict(x)`` runs the deserialized module."""

    call: Any               # jitted exported.call
    variables: Dict[str, Any]
    meta: Dict[str, Any]
    spec: Any = None

    @property
    def input_shape(self) -> Tuple[Optional[int], ...]:
        return tuple(self.meta["input"]["shape"])

    @property
    def input_dtype(self):
        return jnp.dtype(self.meta["input"]["dtype"])

    def predict(self, x) -> jax.Array:
        """Device output (async under jit); ``np.asarray`` it to sync."""
        x = jnp.asarray(x, self.input_dtype)
        fixed = self.input_shape[1:]
        if tuple(x.shape[1:]) != fixed:
            raise ValueError(f"input {x.shape[1:]} != exported {fixed}")
        b = self.input_shape[0]
        if b is not None and x.shape[0] != b:
            raise ValueError(f"batch {x.shape[0]} != exported {b} "
                             "(artifact was exported with a fixed batch)")
        return self.call(self.variables, x)


def load_artifact(path: str) -> ServingModel:
    """Deserialize ``module.bin`` + weights; no model code needed."""
    from jax import export as jexport

    with open(os.path.join(path, "module.bin"), "rb") as f:
        exported = jexport.deserialize(f.read())
    params, batch_stats, wmeta = load_checkpoint(
        os.path.join(path, "weights.ckpt"))
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    qs = (wmeta.get("extra") or {}).get("quant_scales")
    if qs:
        variables["quant_scales"] = jax.tree.map(
            lambda v: jnp.asarray(v, jnp.float32), qs)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != _FORMAT:
        raise ValueError(f"not a serving artifact: {meta.get('format')!r}")
    spec = spec_from_meta(wmeta["spec"]) if "spec" in wmeta else None
    variables = jax.tree.map(jnp.asarray, variables)
    return ServingModel(call=jax.jit(exported.call), variables=variables,
                        meta=meta, spec=spec)


def export_from_run(model_path: str, checkpoint_path: str, out_dir: str,
                    *, height: int, width: int,
                    batch: Optional[int] = None,
                    output: str = "labels", fast: bool = False,
                    quant8=False, calibration=None,
                    input_dtype=jnp.bfloat16,
                    platforms: Optional[Sequence[str]] = None) -> str:
    """Run-dir checkpoint -> serving artifact (the deploy one-liner).

    ``quant8='static'`` needs ``calibration``: an iterable of
    normalized (B, H, W, 3) input batches for the scale calibration
    (`model_loading.calibrate_quant_scales`); the scales ship inside
    the artifact."""
    from scaleprotoseg_tpu.model_loading import (calibrate_quant_scales,
                                                 load_model)

    model, spec, variables = load_model(model_path, checkpoint_path,
                                        dtype=input_dtype, fast=fast,
                                        quant8=quant8)
    if quant8 == "static":
        if calibration is None:
            raise ValueError("quant8='static' export needs calibration "
                             "batches")
        variables = calibrate_quant_scales(model, variables, calibration)
    exported = export_serving(model, variables, height=height,
                              width=width, batch=batch, output=output,
                              input_dtype=input_dtype, fast=fast,
                              platforms=platforms)
    save_artifact(out_dir, exported, variables, spec=spec,
                  extra={"model_path": model_path,
                         "checkpoint": checkpoint_path,
                         "fast": fast, "quant8": quant8})
    return out_dir
