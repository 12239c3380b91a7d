"""Fused bilinear-upsample+argmax kernel (ops/pallas_upsample.py).

The kernel computes the reference's interpolate-then-argmax prediction
step (`segmentation/eval_valid_multiscale.py:229-231`) in one pass.
Its exact contract: per class, H-interp(my) of W-interp(mx) as two
fp32 matmuls, then first-max-wins argmax — identical op composition to
the per-class einsum form tested here, so parity is EXACT (bit), not
tolerance-based.  Interpret mode runs the tests off-TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.ops.pallas_upsample import (
    fused_upsample_argmax, fused_upsample_argmax_sharded)
from scaleprotoseg_tpu.ops.resize import _bilinear_matrix


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _reference(lg, height, width):
    """Same-composition XLA form: per class my @ (x_c @ mx), argmax."""
    h, w = lg.shape[1], lg.shape[2]
    my = jnp.asarray(_bilinear_matrix(height, h))
    mx = jnp.asarray(_bilinear_matrix(width, w).T)
    per = [jnp.einsum("oh,bhp->bop", my,
                      jnp.einsum("bhw,wp->bhp", lg[..., c], mx))
           for c in range(lg.shape[-1])]
    return np.asarray(jnp.argmax(jnp.stack(per, -1), -1))


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 9, 13, 5), (33, 40)),     # tail column block (40 % 128 != 0)
    ((1, 17, 11, 3), (65, 65)),    # odd everything
    ((3, 8, 8, 2), (16, 16)),      # aligned h, tiny C
])
def test_fused_upsample_argmax_exact(rng, shape, out_hw):
    lg = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(fused_upsample_argmax(lg, *out_hw, interpret=True))
    assert got.shape == (shape[0], *out_hw)
    np.testing.assert_array_equal(got, _reference(lg, *out_hw))


def test_fused_upsample_argmax_tie_first_max_wins(rng):
    # constant logits per class: every pixel ties across classes; the
    # jnp.argmax convention (lowest index) must hold
    lg = jnp.ones((1, 6, 6, 4), jnp.float32)
    got = np.asarray(fused_upsample_argmax(lg, 12, 12, interpret=True))
    np.testing.assert_array_equal(got, 0)


def test_fused_upsample_argmax_sharded_batch_mesh(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device conftest mesh")
    lg = jnp.asarray(rng.standard_normal(
        (len(devs), 9, 13, 5)).astype(np.float32))
    ref = np.asarray(fused_upsample_argmax(lg, 33, 40, interpret=True))
    mesh = Mesh(np.asarray(devs), ("data",))
    xs = jax.device_put(lg, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda t: fused_upsample_argmax_sharded(
        t, 33, 40, interpret=True))
    out = fn(xs)
    assert out.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(jax.device_get(out)), ref)
