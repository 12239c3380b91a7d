"""Reconstruct a PPNet model from a run directory + checkpoint.

The reference's eval/analysis scripts ``torch.load`` whole pickled
modules; here checkpoints are param trees + spec metadata, and the model
object is rebuilt from the run's saved ``config.gin`` (copied at train
time, as the reference does — `train_wandb_multiscale.py:187`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu import configlib
from scaleprotoseg_tpu.checkpoints.io import load_checkpoint, spec_from_meta
from scaleprotoseg_tpu.models.factory import construct_ppnet
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.spec import ProtoSpec


def resolve_checkpoint(model_path: str, training_phase: str) -> str:
    """Reference checkpoint naming (`eval_valid_multiscale.py:56-62`)."""
    if training_phase == "pruned":
        return os.path.join(model_path, "pruned", "checkpoints",
                            "push_last.ckpt")
    if training_phase in ("final-group", "push_final"):
        return os.path.join(model_path, "checkpoints",
                            f"{training_phase}.ckpt")
    return os.path.join(model_path, "checkpoints",
                        f"{training_phase}_last.ckpt")


def calibrate_quant_scales(model, variables: Dict, batches,
                           log=None) -> Dict:
    """Post-training-quantization calibration for ``quant8='static'``.

    Runs the FULL-PRECISION forward over ``batches`` (iterable of
    normalized (B, H, W, 3) arrays in the model's input space) with the
    ``quant_scales`` collection mutable: every static ``_QuantConv``
    site folds ``max|x| / 127`` into its running scale
    (`models/layers.py`).  Returns ``variables`` with the calibrated
    ``quant_scales`` collection added — ship these with the serving
    artifact (``serving.export.save_artifact`` persists them).

    Standard PTQ max-calibration: activations outside the calibrated
    range saturate at serve time, so calibrate on inputs that span the
    serving distribution (a handful of real images suffices for
    max-scales; the serve CLI uses the first N inputs of the served
    directory).
    """
    fwd = jax.jit(lambda v, x: model.apply(
        v, x, train=False, mutable=["quant_scales"])[1]["quant_scales"])
    qs = None
    n = 0
    for x in batches:
        v = dict(variables)
        if qs is not None:
            v["quant_scales"] = qs
        qs = fwd(v, jnp.asarray(x))
        n += 1
    if qs is None:
        raise ValueError("calibrate_quant_scales: no calibration batches")
    if log:
        flat = jax.tree.leaves(qs)
        log(f"quant8 calibration: {n} batches, {len(flat)} conv sites, "
            f"scale range [{min(float(s) for s in flat):.2e}, "
            f"{max(float(s) for s in flat):.2e}]")
    return {**variables, "quant_scales": qs}


def load_model(model_path: str, checkpoint_path: str,
               dtype=jnp.float32,
               fast: bool = False,
               quant8=False) -> Tuple[PPNet, ProtoSpec, Dict]:
    """(model, spec, variables) from a run dir's config + checkpoint.

    ``fast=True`` enables the fused Pallas ASPP on DeepLabV2 backbones
    (requires ``dtype=bfloat16``; differentiable via its custom VJP —
    ops/pallas_aspp.fused_aspp_trainable — and batch-shardable on
    multi-device meshes via its custom_partitioning rule).
    ``quant8=True`` additionally runs the layer4/5 ResNet convs in
    dynamic w8a8 int8 (`ops/quant.py`) — inference serving only; the
    param tree is unchanged, so the same checkpoint loads either way.
    ``quant8='static'`` uses calibrated per-site activation scales
    instead (the SPEED path — the dynamic form's per-conv max-reduce
    passes made it a net loss): after loading, run
    ``calibrate_quant_scales(model, variables, batches)`` and serve
    with the returned variables.
    DYNAMIC quant8 (``True``) forces the fully-XLA path (overrides
    ``fast``): the per-conv dynamic quantize flips XLA's activation
    layouts, and ANY downstream Pallas custom call (ASPP, proto head,
    or upsample) then constrains its operand layout, forcing a
    relayout measured at a 3x whole-model cliff on v5e (318 vs 105 ms
    at batch 4 1024x2048, re-confirmed round 4 — ops/quant.py).
    STATIC quant8 has no cliff and COMPOSES with ``fast`` — the
    fastest measured serving config (40.5 img/s vs 38.0 bf16-fast,
    benchmarks/bench_quant_static2.py).  ``make_serving_fn`` applies
    the same dynamic-only guard to its ``fast`` flag.  To measure the
    accuracy cost before deploying int8, run the eval CLI with
    ``--quant8-static`` (eval_valid_multiscale.py): same graph, full
    mIoU protocol, results in a separate ``evaluation/`` dir."""
    from scaleprotoseg_tpu.cli_common import enable_compilation_cache
    enable_compilation_cache()
    params, batch_stats, meta = load_checkpoint(checkpoint_path)
    spec = spec_from_meta(meta["spec"])
    variant = (meta.get("extra") or {}).get("variant")
    if variant is None:
        variant = "group" if "last_layer_group" in params else (
            "multiscale" if spec.num_scales > 1 else "single")

    config_file = os.path.join(model_path, "config.gin")
    if os.path.exists(config_file):
        configlib.clear_config()
        configlib.parse_config_file(config_file)
    cname = "construct_PPNet_Group" if variant == "group" else \
        "construct_PPNet"
    q = lambda p, d=None: (configlib.query(cname, p, None) or  # noqa: E731
                           configlib.query("construct_PPNet", p, None) or
                           configlib.query("construct_PPNet_Group", p, d))

    model, built_spec = construct_ppnet(
        variant=variant,
        base_architecture=q("base_architecture"),
        pretrained=False,
        prototype_shape=(spec.num_prototypes, spec.proto_depth, 1, 1),
        num_classes=spec.num_classes,
        prototype_activation_function=q("prototype_activation_function",
                                        "log"),
        add_on_layers_type=q("add_on_layers_type", "deeplab_simple"),
        scale_head_type=q("scale_head_type", None),
        dtype=dtype)
    if built_spec != spec:
        model = dataclasses.replace(model, spec=spec)
    if fast and quant8 is not True and \
            hasattr(model.backbone, "fast_aspp"):
        model = dataclasses.replace(
            model,
            backbone=dataclasses.replace(model.backbone, fast_aspp=True))
    if quant8:
        if not hasattr(model.backbone, "quant8"):
            raise ValueError("quant8 serving needs a DeepLabV2 backbone; "
                             f"got {type(model.backbone).__name__}")
        # dynamic (True) drops fast_aspp above: the dynamic quantize
        # makes XLA lay activations out batch-second-minor, and any
        # Pallas call's layout constraint then forces a relayout that
        # measured 318 vs 105 ms/batch; static composes cliff-free.
        model = dataclasses.replace(
            model,
            backbone=dataclasses.replace(model.backbone, quant8=quant8))

    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if batch_stats:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, batch_stats)
    return model, spec, variables
