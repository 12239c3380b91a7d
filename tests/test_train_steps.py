"""Training-step integration tests: every phase runs jitted, losses are
finite, frozen partitions stay untouched, invariants hold, and the step
runs data-parallel on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.parallel import create_mesh, shard_batch
from scaleprotoseg_tpu.spec import ProtoSpec
from scaleprotoseg_tpu.train.optim import (
    label_params, make_phase_optimizer, partition_params, phase_groups,
    poly_schedule)
from scaleprotoseg_tpu.train.state import TrainState
from scaleprotoseg_tpu.train.steps import (
    LossWeights, make_eval_step, make_train_step)

HP = dict(warm_lr_add_on=2.5e-4, warm_lr_protos=2.5e-4, warm_wd=5e-4,
          joint_lr_features=2.5e-5, joint_lr_add_on=2.5e-4,
          joint_lr_protos=2.5e-4, joint_wd=5e-4, last_layer_lr=1e-4,
          warm_lr_group=2.5e-4, joint_lr_group=2.5e-4)


def _build(grouped=False):
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4,
                                      num_groups=3 if grouped else 0)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth, grouped=grouped)
    x = jnp.zeros((2, 65, 65, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, spec, variables


def _make_state_and_step(model, spec, variables, variant, phase,
                         weights=LossWeights(kld=0.25), iter_size=1,
                         **step_kw):
    groups = phase_groups(variant, phase, HP)
    trainable, _ = partition_params(variables["params"], set(groups))
    labels = label_params(trainable)
    sched = poly_schedule(0.9, 100) if phase == 1 else None
    tx = make_phase_optimizer(groups, labels, schedule=sched,
                              iter_size=iter_size)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step_kw.setdefault("donate", False)  # tests inspect pre-step arrays
    step = make_train_step(model, spec, tx, set(groups), weights, **step_kw)
    return state, step


def _batch(rng, b=2):
    image = rng.standard_normal((b, 65, 65, 3)).astype(np.float32)
    target = rng.integers(0, 4, size=(b, 65, 65)).astype(np.int32)
    return jnp.asarray(image), jnp.asarray(target)


@pytest.mark.parametrize("variant,phase", [
    ("multiscale", 0),
    # joint phase: 33 s on 1 core (full-backbone backward compile);
    # joint freeze/movement is pinned exactly by the fast group-phase
    # trajectory parity test, so only the warmup/last phases stay fast
    pytest.param("multiscale", 1, marks=pytest.mark.slow),
    ("multiscale", 2)])
def test_proto_phases_step_and_freeze(rng, variant, phase):
    model, spec, variables = _build()
    state, step = _make_state_and_step(model, spec, variables, variant,
                                       phase)
    image, target = _batch(rng)
    before = traverse_util.flatten_dict(state.params, sep="/")
    new_state, metrics = step(state, image, target)
    after = traverse_util.flatten_dict(new_state.params, sep="/")
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kld_loss"]))
    assert 0 <= float(metrics["n_correct"]) <= float(metrics["n_patches"])

    groups = phase_groups(variant, phase, HP)
    from scaleprotoseg_tpu.train.optim import label_of_path
    changed = {k for k in after
               if not np.array_equal(np.array(before[k]),
                                     np.array(after[k]))}
    for k in after:
        label = label_of_path(tuple(k.split("/")))
        if label in groups:
            continue  # trainable; may or may not change
        assert k not in changed, f"frozen param {k} ({label}) changed"
    # something must have moved
    assert changed


def test_warmup_trains_aspp_but_not_backbone(rng):
    model, spec, variables = _build()
    state, step = _make_state_and_step(model, spec, variables,
                                       "multiscale", 0)
    image, target = _batch(rng)
    new_state, _ = step(state, image, target)
    flat_b = traverse_util.flatten_dict(state.params, sep="/")
    flat_a = traverse_util.flatten_dict(new_state.params, sep="/")
    aspp_moved = any(
        not np.array_equal(np.array(flat_b[k]), np.array(flat_a[k]))
        for k in flat_a if "aspp" in k)
    backbone_moved = any(
        not np.array_equal(np.array(flat_b[k]), np.array(flat_a[k]))
        for k in flat_a if k.startswith("backbone/layer"))
    assert aspp_moved and not backbone_moved


@pytest.mark.parametrize("phase", [0, 1, 2])
def test_group_phases(rng, phase):
    model, spec, variables = _build(grouped=True)
    state, step = _make_state_and_step(
        model, spec, variables, "group", phase,
        weights=LossWeights(kld=0.25, group_ent=0.05),
        project_group_simplex=True)
    image, target = _batch(rng)
    new_state, metrics = step(state, image, target)
    assert np.isfinite(float(metrics["loss"]))
    gw = np.array(new_state.params["group_projection"])
    # simplex invariant after the step (ref group_train.py:337-338)
    np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-4)
    assert (gw >= -1e-7).all()
    assert (gw * (1 - spec.class_proto_mask[:, None, :]) == 0).all()
    if phase == 0:
        # only group_projection may change
        assert np.array_equal(np.array(state.params["last_layer_group"]),
                              np.array(new_state.params["last_layer_group"]))


def test_group_grad_masking(rng):
    model, spec, variables = _build(grouped=True)
    state, step = _make_state_and_step(
        model, spec, variables, "group", 1,
        weights=LossWeights(), grad_mask_last_group=True,
        project_group_simplex=True)
    image, target = _batch(rng)
    new_state, _ = step(state, image, target)
    glw_b = np.array(state.params["last_layer_group"])
    glw_a = np.array(new_state.params["last_layer_group"])
    off = spec.group_class_identity == 0
    np.testing.assert_array_equal(glw_b[off], glw_a[off])
    assert not np.array_equal(glw_b[~off], glw_a[~off])


def test_gradient_accumulation_matches_large_batch(rng):
    # iter_size=2 on half-batches == single step on the full batch
    model, spec, variables = _build()
    image, target = _batch(rng, b=4)
    w = LossWeights()  # CE+L1 only: both average cleanly over the batch

    state1, step1 = _make_state_and_step(model, spec, variables,
                                         "multiscale", 2, weights=w,
                                         iter_size=1)
    full_state, _ = step1(state1, image, target)

    state2, step2 = _make_state_and_step(model, spec, variables,
                                         "multiscale", 2, weights=w,
                                         iter_size=2)
    state2, _ = step2(state2, image[:2], target[:2])
    state2, _ = step2(state2, image[2:], target[2:])

    np.testing.assert_allclose(
        np.array(full_state.params["last_layer"]),
        np.array(state2.params["last_layer"]), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("grouped", [
    False,
    # the grouped pyramid adds ~10 s of compile on top of [False];
    # grouped step machinery is fast-covered by test_group_phases and
    # the group trajectory parity test
    pytest.param(True, marks=pytest.mark.slow)])
def test_msc_pyramid_train_step(rng, grouped):
    """Pascal/COCO path: MSC input pyramid -> list of outputs; the loss
    averages across them (ref module_multiscale.py:216-277); also the
    grouped variant (group_scaleproto_pascal/coco configs)."""
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4,
                                      num_groups=3 if grouped else 0)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth,
                  msc_scales=(0.5,), grouped=grouped)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    groups = phase_groups("group" if grouped else "multiscale", 1, HP)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable),
                              schedule=poly_schedule(0.9, 100))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step = make_train_step(model, spec, tx, set(groups),
                           LossWeights(kld=0.25, group_ent=0.05),
                           project_group_simplex=grouped, donate=False)
    image = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 4, (2, 64, 64)), jnp.int32)
    new_state, metrics = step(state, image, target)
    assert np.isfinite(float(metrics["loss"]))
    # n_patches counts all three outputs' grids (base + pyramid + max);
    # ceil-mode OS-8: 64 -> 9x9 grid, 32 (0.5 pyramid) -> 5x5
    base = 9 * 9 * 2
    pyr = 5 * 5 * 2
    assert float(metrics["n_patches"]) == 2 * base + pyr
    if grouped:
        gw = np.asarray(new_state.params["group_projection"])
        np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow  # 72 s on 1 core; DP eval also covered by the driver dryrun
def test_eval_step_and_data_parallel_mesh(rng):
    model, spec, variables = _build()
    state, step = _make_state_and_step(model, spec, variables,
                                       "multiscale", 1)
    eval_step = make_eval_step(model, spec, LossWeights(kld=0.25))

    mesh = create_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    image, target = _batch(rng, b=8)
    image, target = shard_batch((image, target), mesh)
    new_state, metrics = step(state, image, target)
    assert np.isfinite(float(metrics["loss"]))
    em = eval_step(new_state, image, target)
    assert np.isfinite(float(em["loss"]))
    assert float(em["n_patches"]) == 8 * 9 * 9


@pytest.mark.slow  # remat is an opt-in knob; 24 s on 1 core
def test_remat_step_matches_plain(rng):
    """remat=True (jax.checkpoint over the forward) must not change the
    step's numerics — only its memory/compute schedule."""
    model, spec, variables = _build()
    image, target = _batch(rng)
    results = []
    for remat in (False, True):
        state, step = _make_state_and_step(model, spec, variables,
                                           "multiscale", 1, remat=remat)
        new_state, metrics = step(state, image, target)
        results.append((float(metrics["loss"]),
                        np.asarray(new_state.params["prototype_vectors"])))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6,
                               atol=1e-7)


def test_phase_trainer_perf_knobs(tmp_path):
    """train.compute_dtype / train.fast_aspp / train.remat gin knobs:
    the trainer swaps the model's compute dtype, sets the fused-ASPP
    flag, and arms remat (fast profile checks the plumbing only; the
    bf16+remat step execution is the slow twin below)."""
    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    model, spec, _ = _build()
    configlib.clear_config()
    configlib.parse_config("""
train.compute_dtype = 'bfloat16'
train.fast_aspp = True
train.remat = True
PatchClassificationModuleMultiScale.loss_weight_kld = 0.25
""")
    try:
        mhp = module_hparams("multiscale")
        trainer = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                               mhp, log=lambda *a: None)
        assert trainer.model.dtype == jnp.bfloat16
        assert trainer.model.backbone.dtype == jnp.bfloat16
        assert trainer.model.backbone.fast_aspp is True
        assert trainer.remat is True
    finally:
        configlib.clear_config()


@pytest.mark.slow  # bf16+remat train-step compile (~20 s on 1 core)
def test_phase_trainer_perf_knobs_step_runs(tmp_path, rng):
    """The bf16 + remat train step actually compiles and executes."""
    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    model, spec, variables = _build()
    configlib.clear_config()
    configlib.parse_config("""
train.compute_dtype = 'bfloat16'
train.fast_aspp = True
train.remat = True
PatchClassificationModuleMultiScale.loss_weight_kld = 0.25
""")
    try:
        mhp = module_hparams("multiscale")
        trainer = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                               mhp, log=lambda *a: None)

        class OneBatchLoader(list):
            pass

        image, target = _batch(rng)
        loader = OneBatchLoader([(np.asarray(image), np.asarray(target))])
        res = trainer.run_phase(variables, phase=0, max_steps=1,
                                train_loader=loader, val_loader=loader,
                                resume=False)
        assert res.steps_done == 1
    finally:
        configlib.clear_config()


def test_fast_aspp_without_bf16_warns_and_stays_off(tmp_path):
    """train.fast_aspp=True without train.compute_dtype='bfloat16' is
    inert (the ASPP module only takes the fused branch at bf16) — the
    trainer must say so loudly instead of logging it as engaged."""
    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    model, spec, _ = _build()
    configlib.clear_config()
    configlib.parse_config("""
train.fast_aspp = True
PatchClassificationModuleMultiScale.loss_weight_kld = 0.25
""")
    try:
        msgs = []
        mhp = module_hparams("multiscale")
        trainer = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                               mhp, log=msgs.append)
        assert trainer.model.backbone.fast_aspp is False
        assert any("DISABLED" in m for m in msgs), msgs
        assert any("fast_aspp=False" in m for m in msgs), msgs
    finally:
        configlib.clear_config()
