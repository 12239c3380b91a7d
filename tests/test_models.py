"""Model construction + forward-shape/invariant tests (SURVEY.md §4 #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu import configlib
from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.factory import construct_ppnet
from scaleprotoseg_tpu.models.layers import max_pool_ceil
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.models.unet import UNetASPP
from scaleprotoseg_tpu.spec import ProtoSpec


@pytest.fixture(autouse=True)
def clean_config():
    configlib.clear_config()
    yield
    configlib.clear_config()


def test_max_pool_ceil_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for h, w in [(257, 257), (512, 512), (129, 257), (33, 47)]:
        x = rng.standard_normal((1, h, w, 4)).astype(np.float32)
        got = np.array(max_pool_ceil(jnp.asarray(x), 3, 2, 1))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        exp = torch.nn.functional.max_pool2d(
            xt, 3, stride=2, padding=1, ceil_mode=True)
        exp = exp.permute(0, 2, 3, 1).numpy()
        assert got.shape == exp.shape, (h, w, got.shape, exp.shape)
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_deeplab_output_stride_8():
    # Tiny dilated net: blocks (1,1,1,1) keeps compile fast; geometry is
    # what matters (513 -> 65, matching the reference prototype grid).
    model = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    x = jnp.zeros((1, 513, 513, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 65, 65, 32)  # 4 rates * 8 features
    # sum mode -> n_out channels
    model_s = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="sum")
    vars_s = model_s.init(jax.random.PRNGKey(0), x)
    assert model_s.apply(vars_s, x).shape == (1, 65, 65, 8)


def _tiny_ppnet(grouped=False, msc_scales=(), num_classes=3):
    spec = ProtoSpec.equal_allocation(
        24, 8, num_classes=num_classes, num_scales=4,
        num_groups=3 if grouped else 0)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth,
                  add_on_type="deeplab_simple", grouped=grouped,
                  msc_scales=msc_scales)
    return model, spec


def test_ppnet_forward_shapes():
    model, spec = _tiny_ppnet()
    x = jnp.zeros((2, 65, 65, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.logits.shape == (2, 9, 9, 3)
    assert out.distances.shape == (2, 9, 9, 24)
    assert out.activations.shape == (2, 9, 9, 24)
    assert out.group_activations is None
    # last layer init: +1 own-class, -0.5 other (ref model_multiscale.py:477)
    w = np.array(vars_["params"]["last_layer"])
    identity = spec.class_identity
    np.testing.assert_allclose(w[identity > 0], 1.0)
    np.testing.assert_allclose(w[identity == 0], -0.5)
    # prototypes init in [0, 1)
    p = np.array(vars_["params"]["prototype_vectors"])
    assert (p >= 0).all() and (p < 1).all()


def test_ppnet_grouped_forward():
    model, spec = _tiny_ppnet(grouped=True)
    x = jnp.zeros((1, 65, 65, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.logits.shape == (1, 9, 9, 3)
    assert out.group_activations.shape == (1, 9, 9, 3, 3)
    # group rows initialized on the simplex (ref model_multiscale_group.py:516)
    gw = np.array(vars_["params"]["group_projection"])  # (C, G, Pc)
    np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-5)
    assert (gw >= 0).all()
    # padded slots exactly zero
    assert (gw * (1 - spec.class_proto_mask[:, None, :]) == 0).all()
    # group last layer: +1 own-class block, -0.5 elsewhere
    glw = np.array(vars_["params"]["last_layer_group"])
    gci = spec.group_class_identity
    np.testing.assert_allclose(glw[gci > 0], 1.0)
    np.testing.assert_allclose(glw[gci == 0], -0.5)
    # group activations positive (exp) — and nonzero for classes w/ protos
    assert (np.array(out.group_activations) > 0).all()


def test_ppnet_msc_pyramid_train_eval():
    model, _ = _tiny_ppnet(msc_scales=(0.5,))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=True)
    outs = model.apply(vars_, x, train=True)
    # train: [base, pyramid..., max] (ref utils.py:105-111)
    assert isinstance(outs, list) and len(outs) == 3
    assert outs[0].logits.shape[1:3] == outs[2].logits.shape[1:3]
    assert outs[1].logits.shape[1] < outs[0].logits.shape[1]
    out_eval = model.apply(vars_, x, train=False)
    assert not isinstance(out_eval, list)
    assert out_eval.logits.shape == outs[2].logits.shape


def test_unet_aspp_full_resolution():
    model = UNetASPP(out_features=16, multiscale=True, base=8)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 64, 64, 64)  # 4 rates * 16


def test_factory_from_reference_gin():
    configlib.parse_config_file(
        "/root/reference/segmentation/configs/scaleproto_em.gin")
    from scaleprotoseg_tpu.models.factory import construct_PPNet
    model, spec = construct_PPNet(variant="multiscale")
    assert spec.num_prototypes == 24 and spec.num_classes == 2
    assert spec.num_scales == 4 and spec.proto_depth == 64
    assert model.add_on_type == "deeplab_simple"
    assert model.msc_scales == ()


def test_factory_group_variant_reads_num_groups():
    configlib.parse_config_file(
        "/root/reference/segmentation/configs/group_scaleproto_cityscapes.gin")
    from scaleprotoseg_tpu.models.factory import construct_PPNet_Group
    model, spec = construct_PPNet_Group()
    assert model.grouped and spec.num_groups == 3
    assert spec.num_prototypes == 228 and spec.num_classes == 19
