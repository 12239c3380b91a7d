"""Dynamic int8 (w8a8) convolution: exactness, error bounds, wiring.

The int32 accumulation is exact, so when inputs/weights are already
int8-representable the quantized conv must equal the fp32 conv
bit-for-bit; on smooth random data the rounding error is bounded.  The
``quant8`` flag must not change the param tree (any checkpoint loads
into either form) and training must refuse quant8 models — the int8
round() has zero gradient (`models/layers.py`, `ops/quant.py`,
`train/steps.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.ops.quant import (dynamic_int8_conv,
                                         quantize_symmetric)


def _conv_fp32(x, w, dilation=(1, 1), strides=(1, 1), padding="SAME"):
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), strides, padding,
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_quantize_symmetric_roundtrip(rng):
    x = rng.standard_normal((3, 5, 7, 4)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == ()
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s),
                               x, atol=np.abs(x).max() / 127 * 0.51)
    # per-channel: each channel scaled independently
    qc, sc = quantize_symmetric(jnp.asarray(x), axis=3)
    assert sc.shape == (4,)
    for c in range(4):
        assert np.asarray(sc)[c] == pytest.approx(
            np.abs(x[..., c]).max() / 127.0, rel=1e-6)


def test_int8_conv_exact_when_representable(rng):
    # values on the int8 grid -> quantization is lossless -> the int32
    # MXU accumulation must reproduce the fp32 conv exactly.  Dynamic
    # quantization recovers the grid only when the observed max is
    # exactly 127, so pin one per tensor / per weight channel.
    xi = rng.integers(-127, 128, size=(2, 9, 9, 8))
    xi[0, 0, 0, 0] = 127
    wi = rng.integers(-127, 128, size=(3, 3, 8, 16))
    wi[0, 0, 0, :] = 127
    sx = 0.0625                              # powers of two: exact in fp
    sw = np.full(16, 0.03125)
    sw[3] = 0.125                            # distinct per-channel scales
    x = jnp.asarray(xi * sx, jnp.float32)
    w = jnp.asarray(wi * sw, jnp.float32)
    got = dynamic_int8_conv(x, w, dilation=(2, 2))
    want = _conv_fp32(x, w, dilation=(2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_error_bound_random(rng):
    x = jnp.asarray(rng.standard_normal((2, 17, 17, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    got = np.asarray(dynamic_int8_conv(x, w))
    want = np.asarray(_conv_fp32(x, w))
    rms = np.sqrt(((got - want) ** 2).mean()) / \
        np.sqrt((want ** 2).mean())
    assert rms < 0.02, f"relative RMS {rms}"


def test_strided_padded_conv_matches_geometry(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 4, 8)), jnp.float32)
    got = dynamic_int8_conv(x, w, strides=(2, 2),
                            padding=[(0, 0), (0, 0)])
    assert got.shape == (1, 8, 8, 8)


@pytest.fixture(scope="module")
def tiny_pair():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 33, 33, 3)), jnp.float32)
    fp = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    q8 = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat",
                   quant8=True)
    variables = fp.init(jax.random.PRNGKey(0), x)
    return fp, q8, variables, x


def test_quant8_same_param_tree(tiny_pair):
    fp, q8, variables, x = tiny_pair
    v2 = q8.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)


def test_quant8_backbone_close_to_fp(tiny_pair):
    fp, q8, variables, x = tiny_pair
    y_fp = np.asarray(fp.apply(variables, x))
    y_q8 = np.asarray(q8.apply(variables, x))
    rel = np.abs(y_q8 - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < 0.1, f"relative max err {rel}"


@pytest.mark.slow  # 11 s on 1 core; op-level + param-tree quant tests stay fast
def test_quant8_full_ppnet_serving_forward(rng):
    # the serving wiring: tiny flagship PPNet with the quantized
    # backbone, same variables as the fp model, label maps mostly agree
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship, synthetic_init
    from scaleprotoseg_tpu.serving import make_serving_fn

    model, _ = _flagship(tiny=True, grouped=True, dtype=jnp.float32)
    model_q8, _ = _flagship(tiny=True, grouped=True, dtype=jnp.float32,
                            quant8=True)
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, x),
                            jax.random.PRNGKey(0))
    variables = synthetic_init(shapes)
    assert jax.tree_util.tree_structure(shapes) == \
        jax.tree_util.tree_structure(
            jax.eval_shape(lambda k: model_q8.init(k, x),
                           jax.random.PRNGKey(0)))
    y = np.asarray(make_serving_fn(model)(variables, x))
    y_q8 = np.asarray(make_serving_fn(model_q8)(variables, x))
    assert y.shape == y_q8.shape
    assert (y == y_q8).mean() > 0.9, \
        f"label agreement {(y == y_q8).mean():.3f}"


def test_load_model_quant8_rejects_non_deeplab(tmp_path):
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.spec import ProtoSpec

    # a UNet run dir: quant8 must refuse rather than silently serve fp
    spec = ProtoSpec.equal_allocation(8, 4, num_classes=2, num_scales=1)
    (tmp_path / "config.gin").write_text(
        "construct_PPNet.base_architecture = 'unet'\n"
        "construct_PPNet.prototype_activation_function = 'log'\n"
        "construct_PPNet.add_on_layers_type = 'identity'\n"
        "unet_features.unet_n_features = 8\n")
    ckpt = tmp_path / "toy.ckpt"
    save_checkpoint(str(ckpt), {}, spec=spec)
    with pytest.raises(ValueError, match="quant8"):
        load_model(str(tmp_path), str(ckpt), quant8=True)


def test_load_model_quant8_forces_xla_aspp(tmp_path):
    # quant8 + fused Pallas ASPP measured a 3x whole-model cliff (the
    # int8-conv activation layout forces a relayout at the kernel's
    # operand-layout constraint — ops/quant.py), so load_model must
    # drop fast_aspp when quant8 is requested, even with fast=True
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.spec import ProtoSpec

    spec = ProtoSpec.equal_allocation(8, 64, num_classes=2, num_scales=4)
    (tmp_path / "config.gin").write_text(
        "construct_PPNet.base_architecture = "
        "'deeplabv2_resnet50_multiscale'\n"
        "construct_PPNet.prototype_activation_function = 'log'\n"
        "construct_PPNet.add_on_layers_type = 'deeplab_simple'\n"
        "deeplabv2_resnet50_features_multiscale.deeplab_n_features = 64\n")
    ckpt = tmp_path / "toy.ckpt"
    save_checkpoint(str(ckpt), {}, spec=spec)

    model, _, _ = load_model(str(tmp_path), str(ckpt), fast=True,
                             quant8=True)
    assert model.backbone.quant8 is True
    assert model.backbone.fast_aspp is False

    model_fast, _, _ = load_model(str(tmp_path), str(ckpt), fast=True)
    assert model_fast.backbone.fast_aspp is True
    assert model_fast.backbone.quant8 is False


def test_make_serving_fn_drops_fast_for_quant8(rng):
    # same cliff downstream: the fused proto head / fused upsample are
    # Pallas calls too, so make_serving_fn must ignore fast=True on a
    # quant8 model (pinned by equality with the explicit fast=False fn)
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship, synthetic_init
    from scaleprotoseg_tpu.serving import make_serving_fn

    model_q8, _ = _flagship(tiny=True, grouped=True, dtype=jnp.float32,
                            quant8=True)
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)), jnp.float32)
    shapes = jax.eval_shape(lambda k: model_q8.init(k, x),
                            jax.random.PRNGKey(0))
    variables = synthetic_init(shapes)
    y_fast = np.asarray(make_serving_fn(model_q8, fast=True)(variables, x))
    y_slow = np.asarray(make_serving_fn(model_q8, fast=False)(variables, x))
    np.testing.assert_array_equal(y_fast, y_slow)


def test_quantize_symmetric_axis_tuple(rng):
    # the documented tuple-axis mode: keep those axes, reduce the rest
    x = rng.standard_normal((3, 5, 7, 4)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x), axis=(3,))
    qi, si = quantize_symmetric(jnp.asarray(x), axis=3)
    assert s.shape == (4,)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qi))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(si))
    q2, s2 = quantize_symmetric(jnp.asarray(x), axis=(0, 3))
    assert s2.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(s2),
                               np.abs(x).max(axis=(1, 2)) / 127.0,
                               rtol=1e-5)


def test_quant8_training_refused():
    # the int8 round() has zero gradient, so training a quant8 model
    # would silently freeze the backbone (including in frozen-BN phases
    # where train_bn=False but gradients still flow) — make_train_step
    # refuses such models outright
    import sys
    sys.path.insert(0, "/root/repo")
    import optax
    from __graft_entry__ import _flagship
    from scaleprotoseg_tpu.train.steps import LossWeights, make_train_step

    model, spec = _flagship(tiny=True, grouped=True, dtype=jnp.float32,
                            quant8=True)
    with pytest.raises(ValueError, match="quant8"):
        make_train_step(model, spec, optax.sgd(1e-3), {"backbone"},
                        LossWeights())


def test_static_int8_conv_exact_when_representable(rng):
    # static form of the representable-grid oracle: with the true
    # activation scale passed in, the int32 accumulation must
    # reproduce the fp32 conv exactly
    from scaleprotoseg_tpu.ops.quant import static_int8_conv
    xi = rng.integers(-127, 128, size=(2, 9, 9, 8))
    wi = rng.integers(-127, 128, size=(3, 3, 8, 16))
    wi[0, 0, 0, :] = 127
    sx = 0.0625
    sw = np.full(16, 0.03125)
    x = jnp.asarray(xi * sx, jnp.float32)
    w = jnp.asarray(wi * sw, jnp.float32)
    # x_scale is the GRID STEP (amax/127), exactly sx here
    got = static_int8_conv(x, w, jnp.float32(sx), dilation=(2, 2))
    want = _conv_fp32(x, w, dilation=(2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quant8_static_calibrate_then_serve(tiny_pair):
    fp, _, variables, x = tiny_pair
    st = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat",
                   quant8="static")
    y_fp = np.asarray(fp.apply(variables, x))

    # calibration pass: full-precision forward + scale collection
    y_cal, mut = st.apply(variables, x, mutable=["quant_scales"])
    np.testing.assert_allclose(np.asarray(y_cal), y_fp, atol=2e-4)
    scales = mut["quant_scales"]
    leaves = jax.tree.leaves(scales)
    # layer4/5 only: 2 blocks x (reduce, conv3x3, increase, shortcut)
    assert len(leaves) == 8
    assert all(float(s) > 0 for s in leaves)

    # running max across batches: a second, smaller batch cannot
    # shrink any scale
    x2 = x * 0.5
    _, mut2 = st.apply({**variables, "quant_scales": scales}, x2,
                       mutable=["quant_scales"])
    for a, b in zip(jax.tree.leaves(mut2["quant_scales"]), leaves):
        assert float(a) >= float(b) - 1e-9

    # serving pass (immutable scales): close to the fp backbone
    y_st = np.asarray(st.apply({**variables, "quant_scales": scales}, x))
    rel = np.abs(y_st - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < 0.1, f"relative max err {rel}"


def test_calibrate_quant_scales_helper_and_artifact_roundtrip(
        rng, tmp_path):
    # the serving flow: tiny static-quant PPNet -> calibrate via the
    # model_loading helper -> export an artifact -> reload from a
    # fresh deserialize -> identical labels (scales persisted)
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship, synthetic_init
    from scaleprotoseg_tpu.model_loading import calibrate_quant_scales
    from scaleprotoseg_tpu.serving import make_serving_fn
    from scaleprotoseg_tpu.serving.export import (export_serving,
                                                  load_artifact,
                                                  save_artifact)

    model_st, _ = _flagship(tiny=True, grouped=True, dtype=jnp.float32,
                            quant8="static")
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)), jnp.float32)
    shapes = jax.eval_shape(lambda k: model_st.init(k, x),
                            jax.random.PRNGKey(0))
    shapes = dict(shapes)
    shapes.pop("quant_scales", None)   # init-time scales are dummies
    variables = synthetic_init(shapes)

    # un-calibrated serving must refuse loudly
    with pytest.raises(ValueError, match="calibrate"):
        make_serving_fn(model_st)(variables, x)

    batches = [x, jnp.asarray(rng.standard_normal((1, 33, 33, 3)),
                              jnp.float32)]
    cal = calibrate_quant_scales(model_st, variables, batches)
    assert "quant_scales" in cal
    y = np.asarray(make_serving_fn(model_st)(cal, x))

    exported = export_serving(model_st, cal, height=33, width=33,
                              batch=1, input_dtype=jnp.float32)
    save_artifact(str(tmp_path / "art"), exported, cal)
    served = load_artifact(str(tmp_path / "art"))
    assert "quant_scales" in served.variables
    y2 = np.asarray(served.predict(x))
    np.testing.assert_array_equal(y, y2)


def test_load_model_quant8_static_composes_with_fast(tmp_path):
    # the relayout cliff is DYNAMIC-only (re-measured round 4 with
    # clean syncs): static quant8 must keep the fused Pallas fast path
    # — the fastest measured serving config (ops/quant.py table)
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.spec import ProtoSpec

    spec = ProtoSpec.equal_allocation(8, 64, num_classes=2, num_scales=4)
    (tmp_path / "config.gin").write_text(
        "construct_PPNet.base_architecture = "
        "'deeplabv2_resnet50_multiscale'\n"
        "construct_PPNet.prototype_activation_function = 'log'\n"
        "construct_PPNet.add_on_layers_type = 'deeplab_simple'\n"
        "deeplabv2_resnet50_features_multiscale.deeplab_n_features = 64\n")
    ckpt = tmp_path / "toy.ckpt"
    save_checkpoint(str(ckpt), {}, spec=spec)

    model, _, _ = load_model(str(tmp_path), str(ckpt), fast=True,
                             quant8="static")
    assert model.backbone.quant8 == "static"
    assert model.backbone.fast_aspp is True
