"""Spatial (height) sharding of full-image inference on the virtual mesh:
XLA SPMD must partition the dilated conv stack with halo exchanges and
produce the same result as the unsharded forward."""

import numpy as np

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.parallel import create_mesh, spatial_sharding
from scaleprotoseg_tpu.spec import ProtoSpec


def test_height_sharded_forward_matches_unsharded(rng):
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32)
    # height 128 -> 16 rows per device on the 8-device mesh
    x = jnp.asarray(rng.standard_normal((1, 128, 65, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False).logits

    expected = np.asarray(forward(variables, x))

    mesh = create_mesh()
    xs = jax.device_put(x, spatial_sharding(mesh))
    got = forward(variables, xs)
    assert len(got.sharding.device_set) >= 1  # ran under SPMD
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-4, atol=1e-4)
