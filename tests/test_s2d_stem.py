"""Space-to-depth stem conv vs direct 7x7/2 convolution (exact math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.layers import (ConvBN,
                                             conv7x7s2_space_to_depth)


@pytest.mark.parametrize("h,w", [(64, 64), (65, 65), (33, 47)])
def test_s2d_matches_direct_conv(rng, h, w):
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 8)) * 0.1, jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s2d = conv7x7s2_space_to_depth(x, k)
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_convbn_s2d_param_compatible(rng):
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)), jnp.float32)
    m_fast = ConvBN(8, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    s2d_stem=True)
    m_ref = ConvBN(8, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)))
    v = m_fast.init(jax.random.PRNGKey(0), x)
    # identical param tree (conv/kernel + bn) -> checkpoints interchange
    assert v["params"]["conv"]["kernel"].shape == (7, 7, 3, 8)
    out_fast = m_fast.apply(v, x)
    out_ref = m_ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
