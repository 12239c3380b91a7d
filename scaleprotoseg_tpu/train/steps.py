"""Jitted train/eval steps: loss assembly + phase-aware updates.

Replaces the reference Lightning modules' ``_step``
(`module_multiscale.py:180-315`, `module_multiscale_group_train.py:200-355`)
with pure jitted functions:

- label resize to each output grid happens *inside* jit via integer
  gathers (the reference does per-sample PIL resizes on the host every
  step — a noted bottleneck, SURVEY.md §3.1),
- MSC pyramid outputs are a static list; losses are averaged over them
  exactly as the reference does (divide each term by len(outputs)),
- gradients are taken only over the phase's trainable partition; frozen
  params are closed over, so XLA never materializes their backward pass,
- group phase: optional last-layer grad masking (incorrect_strength == 0,
  ref :327-328) and masked simplex projection of the group weights after
  every optimizer step (ref :337-338).

Data parallelism: steps are jitted with NamedSharding-annotated batch
inputs (see parallel.mesh); the gradient all-reduce is inserted by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scaleprotoseg_tpu import losses as L
from scaleprotoseg_tpu.models.ppnet import PPNet, PPNetOutput
from scaleprotoseg_tpu.ops.resize import resize_label_nearest
from scaleprotoseg_tpu.ops.simplex import projection_simplex_sort_masked
from scaleprotoseg_tpu.spec import ProtoSpec
from scaleprotoseg_tpu.train.optim import merge_params, partition_params
from scaleprotoseg_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Gin loss weights (ref PatchClassificationModule* params)."""

    crs_ent: float = 1.0
    l1: float = 1e-4
    kld: float = 0.0               # proto: KLDLoss / group: KLDLossGroup
    entropy: float = 0.0           # proto phase EntropySamplLoss
    spatial_entropy: float = 0.0   # group phase EntropySpatLoss
    norm: float = 0.0
    crs_ent_group: float = 0.0
    scale_max: float = 0.0
    group_ent: float = 0.0


def _losses_for_output(out: PPNetOutput, target_full, spec: ProtoSpec,
                       params, w: LossWeights, grouped: bool,
                       ignore_void: bool, class_weights) -> Dict[str, Any]:
    hp, wp = out.logits.shape[1], out.logits.shape[2]
    target = resize_label_nearest(target_full, hp, wp)

    ce, correct, valid = L.pixel_wise_cross_entropy(
        out.logits, target, ignore_void=ignore_void,
        class_weights=class_weights)
    m: Dict[str, Any] = {"cross_entropy": ce,
                         "n_correct": jnp.sum(correct),
                         "n_patches": jnp.asarray(
                             correct.size, jnp.float32)}
    total = w.crs_ent * ce

    if grouped:
        kld = L.kld_group_loss(out.group_activations, target, spec) \
            if w.kld > 0 else jnp.float32(0)
        l1 = L.last_layer_l1(params["last_layer_group"],
                             spec.group_class_identity)
        spat = L.entropy_spat_loss(out.activations, target, spec) \
            if w.spatial_entropy > 0 else jnp.float32(0)
        nrm = L.norm_loss(out.activations, target, spec) \
            if w.norm > 0 else jnp.float32(0)
        gw = params["group_projection"]
        ceg = L.cross_entropy_group_loss(gw, spec) \
            if w.crs_ent_group > 0 else jnp.float32(0)
        smax = L.scale_max_loss(gw, spec) if w.scale_max > 0 \
            else jnp.float32(0)
        gent = L.entropy_group_loss(gw, spec) if w.group_ent > 0 \
            else jnp.float32(0)
        total = total + w.kld * kld + w.l1 * l1 + \
            w.spatial_entropy * spat + w.norm * nrm + \
            w.crs_ent_group * ceg + w.scale_max * smax + w.group_ent * gent
        m.update(kld_loss=kld, l1=l1, spat_ent_loss=spat, norm_loss=nrm,
                 cross_entropy_group=ceg, scale_max_loss=smax,
                 group_ent_loss=gent)
    else:
        kld = L.kld_loss(out.distances, target, spec) \
            if w.kld > 0 else jnp.float32(0)
        # slice to the active rows: dangling floor-division-leftover bank
        # rows never reach the logits, so they carry no L1 penalty either
        a = spec.num_active_prototypes
        l1 = L.last_layer_l1(params["last_layer"][:a],
                             spec.class_identity[:a])
        ent = L.entropy_sampl_loss(out.activations, target, spec) \
            if w.entropy > 0 else jnp.float32(0)
        nrm = L.norm_loss(out.activations, target, spec) \
            if w.norm > 0 else jnp.float32(0)
        total = total + w.kld * kld + w.l1 * l1 + w.entropy * ent + \
            w.norm * nrm
        m.update(kld_loss=kld, l1=l1, ent_loss=ent, norm_loss=nrm)

    m["loss"] = total
    return m


def compute_losses(model: PPNet, spec: ProtoSpec, params, outputs,
                   target_full, weights: LossWeights, ignore_void: bool,
                   class_weights=None) -> Tuple[jnp.ndarray, Dict]:
    """Total loss + metrics, averaged over MSC pyramid outputs
    (ref module_multiscale.py:216-277)."""
    if not isinstance(outputs, list):
        outputs = [outputs]
    n = len(outputs)
    metrics: Dict[str, Any] = {}
    for out in outputs:
        m = _losses_for_output(out, target_full, spec, params, weights,
                               model.grouped, ignore_void, class_weights)
        for k, v in m.items():
            if k in ("n_correct", "n_patches"):
                metrics[k] = metrics.get(k, 0.0) + v
            else:
                metrics[k] = metrics.get(k, 0.0) + v / n
    return metrics["loss"], metrics


def make_train_step(model: PPNet, spec: ProtoSpec, optimizer,
                    trainable_labels, weights: LossWeights,
                    ignore_void: bool = True, train_bn: bool = False,
                    grad_mask_last_group: bool = False,
                    project_group_simplex: bool = False,
                    class_weights: Optional[np.ndarray] = None,
                    donate: bool = True, remat: bool = False):
    """Build the jitted train step for one phase.

    ``remat``: rematerialize the model forward during the backward pass
    (``jax.checkpoint``).  On v5e at the cityscapes joint config this is
    FASTER than storing activations (45.7 vs ~49 ms grad time measured,
    benchmarks/bench_backward.py) on top of the memory saving — the
    backward becomes compute-bound instead of HBM-bound.  Ignored when
    ``train_bn=True`` (mutable batch_stats don't thread through
    jax.checkpoint)."""
    if getattr(model.backbone, "quant8", False):
        raise ValueError(
            "model was built with quant8=True (dynamic int8 serving "
            "convs — their round() has zero gradient, so training would "
            "silently freeze the backbone); reload without quant8 to "
            "train")
    trainable_labels = frozenset(trainable_labels)
    cw = None if class_weights is None else jnp.asarray(class_weights)

    apply_fwd = lambda v, image: model.apply(v, image, train=True)  # noqa: E731
    if remat and not train_bn:
        apply_fwd = jax.checkpoint(apply_fwd)

    def step(state: TrainState, image, target):
        trainable, frozen = partition_params(state.params, trainable_labels)

        def loss_fn(trainable_p):
            params = merge_params(trainable_p, frozen)
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if train_bn:
                outputs, mutated = model.apply(
                    variables, image, train=True, train_bn=True,
                    mutable=["batch_stats"])
                new_bs = mutated["batch_stats"]
            else:
                outputs = apply_fwd(variables, image)
                new_bs = state.batch_stats
            loss, metrics = compute_losses(
                model, spec, params, outputs, target, weights, ignore_void,
                cw)
            return loss, (metrics, new_bs)

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)

        if grad_mask_last_group and "last_layer_group" in grads:
            # incorrect_strength == 0: restrict last-layer-group updates to
            # own-class entries (ref module_multiscale_group_train.py:327-328)
            gci = jnp.asarray(spec.group_class_identity)
            grads = dict(grads)
            grads["last_layer_group"] = grads["last_layer_group"] * gci

        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        if project_group_simplex and "group_projection" in new_trainable:
            # Reference projects after each optimizer step (:337-338);
            # projection is idempotent so applying it on accumulation
            # micro-steps (where updates are zero) is a no-op.
            mask = jnp.asarray(spec.class_proto_mask)[:, None, :] * \
                jnp.ones((1, spec.num_groups, 1))
            new_trainable = dict(new_trainable)
            new_trainable["group_projection"] = \
                projection_simplex_sort_masked(
                    new_trainable["group_projection"], mask)

        new_params = merge_params(new_trainable, frozen)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: PPNet, spec: ProtoSpec, weights: LossWeights,
                   ignore_void: bool = True,
                   class_weights: Optional[np.ndarray] = None):
    cw = None if class_weights is None else jnp.asarray(class_weights)

    @jax.jit
    def step(state: TrainState, image, target):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, image, train=False)
        _, metrics = compute_losses(model, spec, state.params, outputs,
                                    target, weights, ignore_void, cw)
        return metrics

    return step
