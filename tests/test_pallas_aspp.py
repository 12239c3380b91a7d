"""Fused Pallas ASPP kernel + shifted-matmul ASPP vs dilated-conv golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import ASPP


def _conv_ref(x, weights, biases, rates):
    outs = []
    for w, b, r in zip(weights, biases, rates):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            [(r, r), (r, r)], rhs_dilation=(r, r),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(y + b)
    return jnp.concatenate(outs, -1)


def test_aspp_module_matches_dilated_conv(rng):
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((1, 13, 17, 32)), jnp.float32)
    aspp = ASPP(8, rates, "concat")
    variables = aspp.init(jax.random.PRNGKey(0), x)
    got = np.asarray(aspp.apply(variables, x))
    weights = [variables["params"][f"c{i}"]["kernel"] for i in range(4)]
    biases = [variables["params"][f"c{i}"]["bias"] for i in range(4)]
    ref = np.asarray(_conv_ref(x, weights, biases, rates))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # sum mode
    aspp_s = ASPP(8, rates, "sum")
    got_s = np.asarray(aspp_s.apply(variables, x))
    np.testing.assert_allclose(
        got_s, ref.reshape(*ref.shape[:-1], 4, 8).sum(-2),
        rtol=1e-4, atol=1e-4)


def test_pallas_fused_aspp_interpret(rng):
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((1, 12, 17, 256)), jnp.float32)
    weights = [jnp.asarray(rng.random((3, 3, 256, 64)) * 0.05, jnp.float32)
               for _ in rates]
    biases = [jnp.asarray(rng.random((64,)), jnp.float32) for _ in rates]
    ref = np.asarray(_conv_ref(x, weights, biases, rates))
    got = np.asarray(fused_aspp(x, weights, biases, rates=rates,
                                tile_rows=4, interpret=True)
                     ).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_pallas_fused_aspp_small_channels(rng):
    """C=64 (the EM UNet decoder width): below the 128-lane tiling, the
    kernel zero-pads channels and weights (r5 — previously a Mosaic
    compile error: 'slice shape along dimension 3 must be aligned to
    tiling (128)').  Exact math: the pad contributes 0."""
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((1, 12, 17, 64)), jnp.float32)
    weights = [jnp.asarray(rng.random((3, 3, 64, 16)) * 0.05, jnp.float32)
               for _ in rates]
    biases = [jnp.asarray(rng.random((16,)), jnp.float32) for _ in rates]
    ref = np.asarray(_conv_ref(x, weights, biases, rates))
    got = np.asarray(fused_aspp(x, weights, biases, rates=rates,
                                tile_rows=4, interpret=True)
                     ).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_pallas_fused_aspp_pascal_grid(rng):
    """65x65 grid (pascal/cityscapes 513-window eval) with real rates:
    odd spatial dims + full 24-halo path."""
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp
    rates = (6, 12, 18, 24)
    x = jnp.asarray(rng.random((1, 65, 65, 64)), jnp.float32)
    weights = [jnp.asarray(rng.random((3, 3, 64, 8)) * 0.05, jnp.float32)
               for _ in rates]
    biases = [jnp.asarray(rng.random((8,)), jnp.float32) for _ in rates]
    ref = np.asarray(_conv_ref(x, weights, biases, rates))
    got = np.asarray(fused_aspp(x, weights, biases, rates=rates,
                                interpret=True)).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_pallas_fused_aspp_batch_and_chunk(rng):
    """Batch>1 and a channel count that needs the chunk divisor fallback."""
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp
    rates = (2, 4)
    x = jnp.asarray(rng.random((2, 9, 11, 96)), jnp.float32)
    weights = [jnp.asarray(rng.random((3, 3, 96, 16)) * 0.05, jnp.float32)
               for _ in rates]
    biases = [jnp.asarray(rng.random((16,)), jnp.float32) for _ in rates]
    ref = np.asarray(_conv_ref(x, weights, biases, rates))
    got = np.asarray(fused_aspp(x, weights, biases, rates=rates,
                                tile_rows=4, interpret=True)
                     ).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_aspp_fast_flag_falls_back_off_tpu(rng):
    """fast=True must be a no-op off-TPU (inference kernel is TPU-only):
    identical params, identical outputs."""
    if jax.default_backend() == "tpu":  # conftest pins cpu; be explicit
        pytest.skip("fallback branch only exists off-TPU")
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((1, 13, 17, 32)), jnp.float32)
    slow = ASPP(8, rates, "concat")
    fast = ASPP(8, rates, "concat", fast=True)
    variables = slow.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(slow.apply(variables, x)),
                                  np.asarray(fast.apply(variables, x)))


@pytest.mark.parametrize("mode", ["concat", "sum"])
def test_aspp_fast_path_module_interpret(rng, mode, monkeypatch):
    """Drive the module's fast branch (incl. the sum-mode reshape) off-TPU
    via the SCALEPROTOSEG_FORCE_FAST_ASPP=interpret hook."""
    monkeypatch.setenv("SCALEPROTOSEG_FORCE_FAST_ASPP", "interpret")
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((1, 13, 17, 32)), jnp.bfloat16)
    slow = ASPP(8, rates, mode, dtype=jnp.bfloat16)
    fast = ASPP(8, rates, mode, dtype=jnp.bfloat16, fast=True)
    variables = slow.init(jax.random.PRNGKey(0), x)
    a = np.asarray(slow.apply(variables, x), np.float32)
    b = np.asarray(fast.apply(variables, x), np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)


def test_fused_aspp_sharded_batch_mesh(rng):
    """The custom_partitioning wrapper must run the kernel per batch
    shard on a multi-device mesh and match the unsharded kernel
    bit-for-bit (batch elements are independent grid steps)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from scaleprotoseg_tpu.ops.pallas_aspp import (fused_aspp,
                                                   fused_aspp_sharded)
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device conftest mesh")
    rates = (2, 4)
    x = jnp.asarray(rng.random((len(devs), 9, 11, 96)), jnp.float32)
    weights = [jnp.asarray(rng.random((3, 3, 96, 16)) * 0.05, jnp.float32)
               for _ in rates]
    biases = [jnp.asarray(rng.random((16,)), jnp.float32) for _ in rates]
    ref = np.asarray(fused_aspp(x, weights, biases, rates=rates,
                                tile_rows=4, interpret=True))
    mesh = Mesh(np.asarray(devs), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda x, w, b: fused_aspp_sharded(
        x, w, b, rates=rates, tile_rows=4, interpret=True))
    out = fn(xs, weights, biases)
    assert out.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(jax.device_get(out)), ref)


def test_fused_aspp_trainable_vjp_matches_xla_ad(rng):
    """The custom VJP (manual shifted-matmul transpose) must match AD
    through the dilated-conv golden for dx, dW, db."""
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp_trainable
    rates = (2, 4, 6, 8)
    x = jnp.asarray(rng.random((2, 12, 17, 256)) - 0.5, jnp.float32)
    weights = tuple(
        jnp.asarray(rng.random((3, 3, 256, 64)) * 0.05, jnp.float32)
        for _ in rates)
    biases = tuple(jnp.asarray(rng.random((64,)), jnp.float32)
                   for _ in rates)
    cot = jnp.asarray(rng.standard_normal((2, 12, 17, 256)), jnp.float32)

    def loss_fused(x, w, b):
        y = fused_aspp_trainable(x, w, b, rates=rates, tile_rows=4,
                                 interpret=True)
        return jnp.sum(y.astype(jnp.float32) * cot)

    def loss_ref(x, w, b):
        # same output-dtype contract as the kernel (bf16 result), so both
        # paths see the identically-rounded cotangent
        y = _conv_ref(x, list(w), list(b), rates).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) * cot)

    gx, gw, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, weights,
                                                         biases)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, weights, biases)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)
    for i in range(len(rates)):
        np.testing.assert_allclose(np.asarray(gw[i]), np.asarray(rw[i]),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb[i]), np.asarray(rb[i]),
                                   rtol=1e-3, atol=1e-3)
