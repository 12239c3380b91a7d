"""Classic backbone family smoke tests + receptive-field math golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.classic_backbones import (
    DeepLabV3Scale, DeepLabVGG16, DenseNetFeatures, ResNetFeatures,
    VGGFeatures)
from scaleprotoseg_tpu.models.factory import base_architecture_to_features
from scaleprotoseg_tpu.models.receptive_field import (
    compute_layer_rf_info, compute_proto_layer_rf_info_v2,
    compute_rf_prototype)


def _run(module, size=64):
    x = jnp.zeros((1, size, size, 3))
    vars_ = module.init(jax.random.PRNGKey(0), x)
    return module.apply(vars_, x)


@pytest.mark.slow  # 22 s on 1 core; registry/factory coverage stays fast
def test_resnet_basic_and_bottleneck_shapes():
    y = _run(ResNetFeatures((1, 1, 1, 1), bottleneck=False))
    assert y.shape == (1, 2, 2, 512)
    y = _run(ResNetFeatures((1, 1, 1, 1), bottleneck=True))
    assert y.shape == (1, 2, 2, 2048)


@pytest.mark.slow  # 38 s on 1 core
def test_vgg_and_densenet_shapes():
    y = _run(VGGFeatures(11), size=64)
    assert y.shape == (1, 2, 2, 512)
    y = _run(DenseNetFeatures(121), size=64)
    assert y.shape == (1, 2, 2, 1024)


@pytest.mark.slow  # 24 s on 1 core; registry construction stays fast
def test_deeplab_vgg_and_v3_output_stride_8():
    # ceil-mode pooling: 64 -> 9 at OS 8 (513 -> 65, the reference grid)
    y = _run(DeepLabVGG16(n_out=8, aspp_mode="concat"), size=64)
    assert y.shape == (1, 9, 9, 32)
    y = _run(DeepLabV3Scale(n_out=8, n_blocks=(1, 1, 1, 3)), size=64)
    assert y.shape == (1, 9, 9, 32)  # 1x1 + 3 atrous branches


def test_all_registered_architectures_construct():
    for name, factory in base_architecture_to_features.items():
        kwargs = {}
        if "deeplab" in name or "segformer" in name:
            kwargs["deeplab_n_features"] = 8
        if "unet" in name:
            kwargs["unet_n_features"] = 8
        module, out_ch, scales = factory(pretrained=False, **kwargs)
        assert out_ch > 0, name


def test_conv_info_receptive_field():
    model = ResNetFeatures((1, 1, 1, 1), bottleneck=False)
    f, s, p = model.conv_info()
    rf = compute_proto_layer_rf_info_v2(224, f, s, p,
                                        prototype_kernel_size=1)
    # output grid 224/32 = 7 + final VALID 1x1
    assert rf[0] == 7
    assert rf[1] == 32  # jump = total stride
    box = compute_rf_prototype(224, [0, 3, 3], rf)
    assert box[0] == 0 and 0 <= box[1] < box[2] <= 224


def test_rf_same_valid_padding_semantics():
    rf = compute_layer_rf_info(3, 1, "SAME", [10, 1, 1, 0.5])
    assert rf == [10, 1, 3, 0.5]
    rf = compute_layer_rf_info(3, 1, "VALID", [10, 1, 1, 0.5])
    assert rf[0] == 8 and rf[2] == 3
