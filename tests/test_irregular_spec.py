"""Floor-division-leftover prototype banks (P % num_scales != 0).

The shipped regime: group_scaleproto_coco's (2054, 64, 1, 1) bank with 4
scales — the reference allocates 2054 // 4 = 513 prototypes per scale
(model_multiscale_group.py:152-160), so bank rows 2052-2053 fall outside
every scale range and never appear in the concatenated distance tensor.
These tests pin the distance-layout contract end-to-end on a tiny
analog (P=10, S=4 -> 8 active) plus the real COCO shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.ops.pallas_proto import fused_proto_logits
from scaleprotoseg_tpu.spec import ProtoSpec
from scaleprotoseg_tpu.train.optim import (label_params,
                                           make_phase_optimizer,
                                           partition_params, phase_groups)
from scaleprotoseg_tpu.train.state import TrainState
from scaleprotoseg_tpu.train.steps import LossWeights, make_train_step

HP = dict(warm_lr_add_on=2.5e-4, warm_lr_protos=2.5e-4, warm_wd=5e-4,
          joint_lr_features=2.5e-5, joint_lr_add_on=2.5e-4,
          joint_lr_protos=2.5e-4, joint_wd=5e-4, last_layer_lr=1e-4,
          warm_lr_group=2.5e-4, joint_lr_group=2.5e-4)


def _irregular(grouped=False):
    # P=10, S=4: per scale 2, active 8, danglers {8, 9} with class -1;
    # 10 // 2 // 4 = 1 prototype per (class, scale).
    spec = ProtoSpec.equal_allocation(10, 8, num_classes=2, num_scales=4,
                                      num_groups=2 if grouped else 0)
    assert spec.num_prototypes == 10
    assert spec.num_active_prototypes == 8
    assert spec.class_ids[8] == -1 and spec.class_ids[9] == -1
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth, grouped=grouped)
    return model, spec


def test_spec_rejects_inconsistent_layouts():
    with pytest.raises(ValueError, match="contiguous"):
        ProtoSpec(num_classes=2, num_scales=2, proto_depth=4,
                  class_ids=(0, 1, 0, 1),
                  scale_bounds=((0, 2), (3, 4)))
    with pytest.raises(ValueError, match="outside every scale bound"):
        ProtoSpec(num_classes=2, num_scales=2, proto_depth=4,
                  class_ids=(0, 1, 0, 1, 1),
                  scale_bounds=((0, 2), (2, 4)))
    # dangling unassigned tail is the legitimate leftover form
    ProtoSpec(num_classes=2, num_scales=2, proto_depth=4,
              class_ids=(0, 1, 0, 1, -1),
              scale_bounds=((0, 2), (2, 4)))


def test_plain_forward_excludes_danglers(rng):
    model, spec = _irregular()
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.distances.shape == (1, 9, 9, 8)
    assert out.activations.shape == (1, 9, 9, 8)
    # logits == activations @ the active slice of the (10, C) last layer
    w = np.asarray(variables["params"]["last_layer"])
    assert w.shape == (10, 2)
    want = np.asarray(out.activations) @ w[:8]
    np.testing.assert_allclose(np.asarray(out.logits), want,
                               rtol=1e-5, atol=1e-5)


def test_grouped_forward_matches_loop(rng):
    model, spec = _irregular(grouped=True)
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.distances.shape == (1, 9, 9, 8)
    assert out.group_activations.shape == (1, 9, 9, 2, 2)
    # naive per-class loop over the reference's gather semantics
    act = np.asarray(out.activations)
    gw = np.asarray(variables["params"]["group_projection"])  # (C, G, Pc)
    glw = np.asarray(variables["params"]["last_layer_group"])
    groups = np.zeros(act.shape[:-1] + (2, 2), np.float32)
    for c in range(2):
        idx = [p for p in range(8) if spec.class_ids[p] == c]
        a_c = act[..., idx]                                  # (.., Pc)
        groups[..., c, :] = np.exp(
            a_c @ gw[c, :, :len(idx)].T)
    np.testing.assert_allclose(np.asarray(out.group_activations), groups,
                               rtol=1e-4, atol=1e-5)
    want = groups.reshape(groups.shape[:-2] + (-1,)) @ glw
    np.testing.assert_allclose(np.asarray(out.logits), want,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("grouped", [False, True])
def test_train_step_irregular_all_losses(rng, grouped):
    """Joint-phase step with every spec-indexed loss enabled — the
    regression that motivated this file: the scatter-free one-hot loss
    gathers crashed on 2052-wide distances vs 2054-wide selectors."""
    model, spec = _irregular(grouped=grouped)
    x = jnp.zeros((2, 65, 65, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    groups = phase_groups("group" if grouped else "multiscale", 1, HP)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    if grouped:
        weights = LossWeights(kld=0.25, group_ent=0.05,
                              spatial_entropy=0.01, norm=0.01,
                              crs_ent_group=0.01, scale_max=0.01)
    else:
        weights = LossWeights(kld=0.25, entropy=0.01, norm=0.01)
    step = make_train_step(model, spec, tx, set(groups), weights,
                           project_group_simplex=grouped, donate=False)
    image = jnp.asarray(rng.standard_normal((2, 65, 65, 3)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 3, (2, 65, 65)), jnp.int32)
    new_state, metrics = step(state, image, target)
    assert np.isfinite(float(metrics["loss"]))
    if not grouped:
        # the L1 sparsity term covers only the active rows — dangling
        # bank rows never reach the logits so they carry no penalty
        w = np.asarray(state.params["last_layer"])[:8]
        want = np.abs(w * (1 - spec.class_identity[:8])).sum()
        np.testing.assert_allclose(float(metrics["l1"]), want, rtol=1e-5)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    assert changed
    if grouped:
        gw = np.asarray(new_state.params["group_projection"])
        np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-4)


def test_coco_group_shapes_forward_and_losses(rng):
    """The real shipped regime at head scale: C=182, P=2054, G=3 (bank
    bigger than active).  Head-only (no backbone) to stay CPU-cheap."""
    from scaleprotoseg_tpu.losses.losses import (entropy_spat_loss,
                                                 kld_loss, norm_loss)
    spec = ProtoSpec.equal_allocation(2054, 16, num_classes=182,
                                      num_scales=4, num_groups=3)
    d = jnp.asarray(rng.random((1, 5, 5, spec.num_active_prototypes)),
                    jnp.float32)
    t = jnp.asarray(rng.integers(0, 183, (1, 5, 5)), jnp.int32)
    for fn in (kld_loss, norm_loss, entropy_spat_loss):
        assert np.isfinite(float(fn(d, t, spec)))


@pytest.mark.parametrize("grouped", [False, True])
def test_fused_pallas_head_irregular(rng, grouped):
    model, spec = _irregular(grouped=grouped)
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x).logits)
    feats = model.apply(variables, x, method="conv_features")
    p = variables["params"]
    if grouped:
        got = fused_proto_logits(
            feats, p["prototype_vectors"], None, spec,
            group_projection=p["group_projection"],
            last_layer_group=p["last_layer_group"], interpret=True)
    else:
        got = fused_proto_logits(feats, p["prototype_vectors"],
                                 p["last_layer"], spec, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_push_min_step_never_picks_danglers(rng):
    from scaleprotoseg_tpu.push.push import _make_min_step
    model, spec = _irregular()
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    target = jnp.asarray(rng.integers(0, 3, (1, 65, 65)), jnp.int32)
    vals, row, flat_idx = _make_min_step(model, spec)(variables, x, target)
    vals = np.asarray(vals)
    assert vals.shape == (10,)
    assert np.isinf(vals[8:]).all()
    assert np.isfinite(vals[:8]).all()
