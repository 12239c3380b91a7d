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


def test_shard_batch_strict_raises_on_indivisible():
    mesh = create_mesh(n_devices=min(8, len(jax.devices())))
    if mesh.devices.size <= 1:
        pytest.skip("single device")
    x = jnp.zeros((3, 4, 4, 3))
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch((x,), mesh, strict=True)


def test_data_parallel_batch_scales():
    from scaleprotoseg_tpu.cli_common import data_parallel_batch
    mesh = create_mesh(n_devices=min(8, len(jax.devices())))
    n = mesh.devices.size
    msgs = []
    out = data_parallel_batch(2, mesh, log=msgs.append)
    assert out == 2 * n if n > 1 else out == 2
    mesh1 = create_mesh(n_devices=1)
    assert data_parallel_batch(2, mesh1, log=msgs.append) == 2
