"""Shared benchmark plumbing: build a config's REAL joint train step.

Used by bench_configs.py (per-config step timing) and
bench_step_decompose.py (per-layer backward localization at any
config's shapes).  Mirrors exactly what train/runner.py assembles for
the joint phase: gin-driven model (backbone, prototype bank, MSC
pyramid), phase optimizer groups, and make_train_step — so measured
numbers price the production path, not a benchmark-only variant.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple


class BuiltStep(NamedTuple):
    name: str
    variant: str
    model: object          # with any fast knobs applied
    spec: object
    variables: dict        # zeros at real shapes (weights don't matter)
    state: object          # TrainState over the joint-phase groups
    step: object           # jitted train step (donate per the flag)
    mhp: dict              # module_hparams(variant)
    groups: dict           # phase_groups for the joint phase
    img: object
    tgt: object
    batch: int
    window: tuple
    tx: object             # the phase optimizer (rebuild steps with it)


def build_from_config(name: str, *, fast_gradconv: bool = False,
                      fast_aspp: bool = False, remat: bool = False,
                      dtype=None, donate: bool = False) -> BuiltStep:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu import cli_common, configlib
    from scaleprotoseg_tpu.models.factory import (construct_PPNet,
                                                  construct_PPNet_Group)
    from scaleprotoseg_tpu.train.optim import (label_params,
                                               make_phase_optimizer,
                                               partition_params,
                                               phase_groups, poly_schedule)
    from scaleprotoseg_tpu.train.runner import module_hparams
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import make_train_step

    if dtype is None:
        dtype = jnp.bfloat16

    cli_common.load_config(name)
    hp = cli_common.train_hparams()
    # group_* configs bind construct_PPNet_Group; coco's proto phase is
    # the reference's single-scale pipeline (scaleproto_coco.gin binds
    # PatchClassificationModule / PPNet)
    if configlib.query("construct_PPNet_Group", "prototype_shape", None):
        variant = "group"
    elif configlib.query("PPNetMultiScale", "num_scales", None):
        variant = "multiscale"
    else:
        variant = "single"
    mhp = module_hparams(variant)
    if variant == "group":
        model, spec = construct_PPNet_Group(pretrained=False, dtype=dtype)
    else:
        model, spec = construct_PPNet(variant=variant, pretrained=False,
                                      dtype=dtype)
    brepl = {}
    if fast_gradconv and hasattr(model.backbone, "fast_gradconv"):
        brepl["fast_gradconv"] = True
    if fast_aspp and hasattr(model.backbone, "fast_aspp"):
        brepl["fast_aspp"] = True
    if brepl:
        model = dataclasses.replace(
            model, backbone=dataclasses.replace(model.backbone, **brepl))

    window = configlib.query("PatchClassificationDataset", "window_size",
                             (513, 513))
    h, w = int(window[0]), int(window[1])
    batch = int(hp["joint_batch_size"])

    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3), dtype)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    groups = phase_groups(variant, 1, mhp["hp"],
                          joint_last=mhp["joint_last"],
                          joint_no_proto=mhp["joint_no_proto"],
                          has_scale_head=model.scale_head_type is not None)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable),
                              schedule=poly_schedule(mhp["poly_lr_power"],
                                                     30000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step = make_train_step(model, spec, tx, set(groups), mhp["weights"],
                           ignore_void=mhp["ignore_void_class"],
                           project_group_simplex=(variant == "group"),
                           donate=donate, remat=remat)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)), dtype)
    tgt = jnp.asarray(
        rng.integers(0, spec.num_classes + 1, (batch, h, w)), jnp.int32)
    return BuiltStep(name, variant, model, spec, variables, state, step,
                     mhp, groups, img, tgt, batch, (h, w), tx)
