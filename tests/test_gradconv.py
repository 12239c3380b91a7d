"""conv3x3_dilated (ops/gradconv.py): the shifted-matmul custom-VJP
backward must be numerically the SAME gradient as XLA's conv-grad
lowering (it is an exact re-expression — nine pointwise matmuls over
shifted views — not an approximation), and the fast_grad/fast_gradconv
plumbing must not change forward numerics or the param tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.ops.gradconv import conv3x3_dilated


def _plain(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_value_and_grads_match_xla(rng, dilation):
    x = jnp.asarray(rng.standard_normal((2, 17, 19, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((2, 17, 19, 16)), jnp.float32)

    got = jax.jit(conv3x3_dilated, static_argnums=2)(x, w, dilation)
    want = _plain(x, w, dilation)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def loss_fast(x, w):
        return jnp.vdot(conv3x3_dilated(x, w, dilation), dy)

    def loss_ref(x, w):
        return jnp.vdot(_plain(x, w, dilation), dy)

    gx_f, gw_f = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))(x, w)
    gx_r, gw_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, w)
    # same math, different summation order -> fp32 roundoff only
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=2e-5, atol=2e-4)


def test_backbone_fast_gradconv_same_forward_and_close_grads(rng):
    """DeepLabV2(fast_gradconv=True): identical param tree, identical
    forward (same conv op), and backbone grads equal to the plain model
    up to fp32 summation order."""
    import dataclasses

    from scaleprotoseg_tpu.models.deeplab import DeepLabV2

    base = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    fast = dataclasses.replace(base, fast_gradconv=True)
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(fast.init(jax.random.PRNGKey(0), x)) == \
        jax.tree.structure(variables)

    y_base = jax.jit(lambda v: base.apply(v, x))(variables)
    y_fast = jax.jit(lambda v: fast.apply(v, x))(variables)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_base))

    def loss(model, v):
        return jnp.sum(model.apply(v, x) ** 2)

    g_base = jax.jit(jax.grad(lambda v: loss(base, v)))(variables)
    g_fast = jax.jit(jax.grad(lambda v: loss(fast, v)))(variables)
    for p, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_base),
            zip(jax.tree.leaves(g_base), jax.tree.leaves(g_fast))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(p[0]))


def test_trainer_knob_sets_fast_gradconv(tmp_path):
    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.spec import ProtoSpec
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    spec = ProtoSpec.equal_allocation(8, 8, num_classes=2, num_scales=4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=spec.feature_depth)
    configlib.clear_config()
    configlib.parse_config("train.fast_gradconv = True")
    try:
        trainer = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                               module_hparams("multiscale"),
                               log=lambda *a: None)
        assert trainer.model.backbone.fast_gradconv is True
    finally:
        configlib.clear_config()
