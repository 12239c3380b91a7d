"""Phase-based optimizers.

The reference drives three training phases per model family with
hand-built torch Adam param groups + ``requires_grad`` freezing helpers
(`module_multiscale.py:393-463`, `module_multiscale_group_train.py:449+`,
`train_and_test.py`) and a PolynomialLR decay stepped once per
accumulated optimizer step.  TPU-native equivalent: one
``optax.multi_transform`` over path-derived parameter labels, per-group
Adam chains with torch-style *coupled* weight decay
(``add_decayed_weights`` before ``scale_by_adam``), a shared polynomial
schedule factor, and ``optax.MultiSteps`` for ``iter_size`` gradient
accumulation (the reference divides the loss by ``iter_size`` and sums —
identical to MultiSteps' gradient mean).

Frozen parameters are excluded from differentiation entirely (the train
step partitions params by label), not merely zeroed — XLA then drops the
dead backward compute.

Labels:
  features_conv  backbone convs outside the ASPP ("1x" group, utils.py:47-54)
  aspp_w/aspp_b  ASPP branch weights/biases ("10x"/"20x", both 10x lr)
  features_bn    backbone BatchNorm affine (never in any reference
                 optimizer; trainable only conceptually for UNet paths)
  add_on         add-on layers
  scale_head     optional WeightedAgg
  prototypes     prototype bank
  last_layer / group_projection / last_layer_group  heads
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def label_of_path(path: Tuple[str, ...]) -> str:
    joined = "/".join(path)
    if path[-1] == "prototype_vectors":
        return "prototypes"
    if path[-1] == "last_layer":
        return "last_layer"
    if path[-1] == "last_layer_group":
        return "last_layer_group"
    if path[-1] == "group_projection":
        return "group_projection"
    if path[0] == "add_on_layers":
        return "add_on"
    if path[0] == "scale_head":
        return "scale_head"
    if "aspp" in joined or "decode_head" in joined:
        # decode_head: the SegFormer all-MLP head is the ASPP analog —
        # warm-up trainable, 10x joint lr (ref
        # em/module_multiscale_em.py:347-351,395-405).
        if path[-1] == "bias":
            return "aspp_b"
        return "aspp_w"
    if "bn" in path:
        return "features_bn"
    return "features_conv"


def label_params(params) -> Dict:
    flat = traverse_util.flatten_dict(params)
    labels = {k: label_of_path(k) for k in flat}
    return traverse_util.unflatten_dict(labels)


@dataclasses.dataclass(frozen=True)
class OptimGroup:
    lr: float
    weight_decay: float = 0.0
    use_schedule: bool = False


def poly_schedule(power: float, iter_max: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """PolynomialLR factor: (1 - t/iter_max)^power, clamped at 0
    (reference submodule `libs.utils.PolynomialLR`, stepped per optimizer
    step with iter_max = max_steps // iter_size,
    module_multiscale.py:458-461)."""

    def fn(count):
        frac = 1.0 - jnp.minimum(count, iter_max) / iter_max
        return jnp.maximum(frac, 0.0) ** power

    return fn


def phase_groups(variant: str, phase: int, hp: Dict[str, float],
                 joint_last: bool = True, joint_no_proto: bool = False,
                 has_scale_head: bool = False) -> Dict[str, OptimGroup]:
    """Trainable label -> OptimGroup for a (variant, phase).

    ``hp`` carries the gin lrs/wd:
      warm_lr_add_on, warm_lr_protos, warm_wd, joint_lr_features,
      joint_lr_add_on, joint_lr_protos, joint_wd, last_layer_lr,
      warm_lr_group, joint_lr_group.
    Matches `module_multiscale.py:393-463` (proto) and
    `module_multiscale_group_train.py:449-505` (group).
    """
    g: Dict[str, OptimGroup] = {}
    if variant in ("single", "multiscale"):
        if phase == 0:  # warm-up: add-ons + ASPP (+ scale head) + protos
            g["add_on"] = OptimGroup(hp["warm_lr_add_on"], hp["warm_wd"])
            g["aspp_w"] = OptimGroup(hp["warm_lr_add_on"], hp["warm_wd"])
            g["aspp_b"] = OptimGroup(hp["warm_lr_add_on"], hp["warm_wd"])
            if has_scale_head:
                g["scale_head"] = OptimGroup(hp["warm_lr_add_on"],
                                             hp["warm_wd"])
            g["prototypes"] = OptimGroup(hp["warm_lr_protos"])
        elif phase == 1:  # joint, poly decay
            g["add_on"] = OptimGroup(hp["joint_lr_add_on"], hp["joint_wd"],
                                     use_schedule=True)
            if has_scale_head:
                g["scale_head"] = OptimGroup(hp["joint_lr_add_on"],
                                             hp["joint_wd"],
                                             use_schedule=True)
            g["features_conv"] = OptimGroup(hp["joint_lr_features"],
                                            hp["joint_wd"], use_schedule=True)
            g["aspp_w"] = OptimGroup(10 * hp["joint_lr_features"],
                                     hp["joint_wd"], use_schedule=True)
            g["aspp_b"] = OptimGroup(10 * hp["joint_lr_features"],
                                     hp["joint_wd"], use_schedule=True)
            g["prototypes"] = OptimGroup(hp["joint_lr_protos"],
                                         use_schedule=True)
        else:  # last layer only
            g["last_layer"] = OptimGroup(hp["last_layer_lr"])
    elif variant == "group":
        if phase == 0:
            g["group_projection"] = OptimGroup(hp["warm_lr_group"])
        elif phase == 1:
            if joint_last:
                g["group_projection"] = OptimGroup(hp["joint_lr_group"],
                                                   use_schedule=True)
                g["last_layer_group"] = OptimGroup(hp["last_layer_lr"],
                                                   use_schedule=True)
            else:
                g["features_conv"] = OptimGroup(hp["joint_lr_features"],
                                                hp["joint_wd"],
                                                use_schedule=True)
                g["aspp_w"] = OptimGroup(10 * hp["joint_lr_features"],
                                         hp["joint_wd"], use_schedule=True)
                g["aspp_b"] = OptimGroup(10 * hp["joint_lr_features"],
                                         hp["joint_wd"], use_schedule=True)
                g["add_on"] = OptimGroup(hp["joint_lr_add_on"],
                                         hp["joint_wd"], use_schedule=True)
                if not joint_no_proto:
                    g["prototypes"] = OptimGroup(hp["joint_lr_protos"],
                                                 use_schedule=True)
                g["group_projection"] = OptimGroup(hp["joint_lr_group"],
                                                   use_schedule=True)
                g["last_layer_group"] = OptimGroup(hp["last_layer_lr"],
                                                   use_schedule=True)
        else:
            g["last_layer_group"] = OptimGroup(hp["last_layer_lr"])
    else:
        raise ValueError(variant)
    return g


def make_phase_optimizer(
    groups: Dict[str, OptimGroup],
    labels_tree,
    schedule: Optional[Callable] = None,
    iter_size: int = 1,
    guard_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """Build the multi_transform optimizer over trainable labels.

    ``labels_tree`` must only contain labels present in ``groups`` (the
    caller partitions out frozen parameters before differentiation).

    ``guard_nonfinite`` > 0 wraps the optimizer in
    ``optax.apply_if_finite``: steps whose gradients contain NaN/inf are
    skipped (update = 0, moments untouched) up to that many consecutive
    times — elastic-training hygiene the reference lacks (a single bad
    batch there corrupts Adam state for good)."""
    transforms = {}
    for label, grp in groups.items():
        chain = []
        if grp.weight_decay:
            chain.append(optax.add_decayed_weights(grp.weight_decay))
        chain.append(optax.scale_by_adam())
        if grp.use_schedule and schedule is not None:
            chain.append(optax.scale_by_schedule(schedule))
        chain.append(optax.scale(-grp.lr))
        transforms[label] = optax.chain(*chain)
    tx = optax.multi_transform(transforms, labels_tree)
    if iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=iter_size)
    if guard_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=guard_nonfinite)
    return tx


def partition_params(params, trainable_labels) -> Tuple[Dict, Dict]:
    """Split a flax param dict into (trainable, frozen) sub-dicts by label."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items()
             if label_of_path(k) in trainable_labels}
    frozen = {k: v for k, v in flat.items()
              if label_of_path(k) not in trainable_labels}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable, frozen):
    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)
