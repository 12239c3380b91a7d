"""Spatial (height) sharding on the virtual mesh: XLA SPMD must
partition the dilated conv stack with halo exchanges — for inference
(1D ``space`` mesh) and for the full training step (2D data x space
mesh, halo exchanges in the backward too) — and match the unsharded
computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.parallel import (create_mesh, create_mesh_2d,
                                        shard_batch_2d, spatial_sharding)
from scaleprotoseg_tpu.spec import ProtoSpec


def test_height_sharded_forward_matches_unsharded(rng):
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32)
    # 2-device mesh keeps the halo-exchange partitioning (the property
    # under test) at a fraction of the 8-way SPMD compile cost on this
    # 1-core host; the full-depth 8-device 2D leg runs in
    # dryrun_multichip every round.  Height 64 -> 32 rows per device.
    x = jnp.asarray(rng.standard_normal((1, 64, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False).logits

    expected = np.asarray(forward(variables, x))

    mesh = create_mesh(n_devices=2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    got = forward(variables, xs)
    assert len(got.sharding.device_set) >= 1  # ran under SPMD
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-4, atol=1e-4)


def test_shard_batch_2d_raises_on_indivisible():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = create_mesh_2d(2, 2)
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch_2d((jnp.zeros((2, 33, 32, 3)),), mesh)  # H % 2 != 0
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch_2d((jnp.zeros((3, 32, 32, 3)),), mesh)  # B % 2 != 0
    (ok,) = shard_batch_2d((jnp.zeros((2, 32, 33, 3)),), mesh)
    assert len(ok.sharding.device_set) == 4


@pytest.mark.slow  # two toy-model train-step compiles on CPU
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_step_2d_mesh_matches_single_device():
    """dp x sp training: the train step jitted over a (2, 4) data x space
    mesh (batch sharded on ``data``, image height on ``space`` — GSPMD
    halo exchanges in the forward AND backward convs, gradient psum over
    both axes) must follow the single-device loss trajectory and land on
    the same params."""
    from test_multichip_dp import _setup

    rng = np.random.default_rng(13)
    batches = [
        (jnp.asarray(rng.standard_normal((2, 32, 33, 3)), jnp.float32),
         jnp.asarray(rng.integers(0, 4, (2, 32, 33)), jnp.int32))
        for _ in range(3)
    ]

    losses, finals = [], []
    for shape in ((1, 1), (2, 4)):
        mesh = create_mesh_2d(*shape)
        state, step = _setup()
        trace = []
        with mesh:
            for image, target in batches:
                sharded = shard_batch_2d((image, target), mesh)
                assert len(sharded[0].sharding.device_set) == \
                    shape[0] * shape[1]
                state, metrics = step(state, *sharded)
                trace.append(float(metrics["loss"]))
        losses.append(trace)
        finals.append(jax.device_get(state.params))

    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(finals[0])
    flat1 = jax.tree_util.tree_leaves(finals[1])
    for (path, a), b in zip(flat0, flat1):
        # same tolerance rationale as the DP trajectory test: Adam's
        # sqrt(v) amplifies fp32 reduction-order differences between the
        # sharded psum (+ halo-exchange partial sums) and the
        # single-device computation on near-zero second moments
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4,
            err_msg=f"2D-mesh divergence at {jax.tree_util.keystr(path)}")
