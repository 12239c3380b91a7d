"""Classic feature extractors + extra DeepLab variants.

Fills out the reference's registered-but-configless backbone families
(SURVEY.md §2.3: `resnet_features.py`, `vgg_features.py`,
`densenet_features.py` — torchvision-style extractors exposing
``conv_info()`` for receptive-field computation — plus
`deeplabv2_vgg16[_multiscale]` and `deeplabv3_resnet101_multiscale`
from the missing submodule's surface).

All NHWC Flax, output channels:
  ResNet-18/34 -> 512, ResNet-50/101/152 -> 2048
  VGG-11/13/16/19 (+bn) -> 512
  DenseNet-121/161/169/201 -> 1024/2208/1664/1920
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import ASPP, Bottleneck, ResLayer, Stem
from scaleprotoseg_tpu.models.layers import ConvBN, max_pool_ceil


class ConvInfo:
    """Accumulates (filter, stride, padding) per layer for RF math."""

    def __init__(self):
        self.filters: List[int] = []
        self.strides: List[int] = []
        self.paddings: List = []

    def add(self, f, s, p):
        self.filters.append(f)
        self.strides.append(s)
        self.paddings.append(p)

    def tuple(self):
        return self.filters, self.strides, self.paddings


# ---------------------------------------------------------------------------
# ResNet (torchvision-style: stride on the 3x3)
# ---------------------------------------------------------------------------
class BasicBlock(nn.Module):
    features: int
    stride: int
    shortcut: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = ConvBN(self.features, (3, 3), strides=(self.stride,) * 2,
                   dtype=self.dtype, name="conv1")(x, train_bn)
        h = ConvBN(self.features, (3, 3), relu=False, dtype=self.dtype,
                   name="conv2")(h, train_bn)
        if self.shortcut:
            x = ConvBN(self.features, (1, 1), strides=(self.stride,) * 2,
                       relu=False, dtype=self.dtype, name="shortcut")(
                x, train_bn)
        return nn.relu(h + x)


class TorchvisionBottleneck(nn.Module):
    mid: int
    out: int
    stride: int
    shortcut: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = ConvBN(self.mid, (1, 1), dtype=self.dtype,
                   name="conv1")(x, train_bn)
        h = ConvBN(self.mid, (3, 3), strides=(self.stride,) * 2,
                   dtype=self.dtype, name="conv2")(h, train_bn)
        h = ConvBN(self.out, (1, 1), relu=False, dtype=self.dtype,
                   name="conv3")(h, train_bn)
        if self.shortcut:
            x = ConvBN(self.out, (1, 1), strides=(self.stride,) * 2,
                       relu=False, dtype=self.dtype, name="shortcut")(
                x, train_bn)
        return nn.relu(h + x)


class ResNetFeatures(nn.Module):
    n_blocks: Tuple[int, ...]
    bottleneck: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        x = ConvBN(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   dtype=self.dtype, name="stem")(x, train_bn)
        # torchvision uses floor-mode pooling (unlike the caffe DeepLab stem)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (n, w) in enumerate(zip(self.n_blocks, widths)):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                if self.bottleneck:
                    x = TorchvisionBottleneck(
                        mid=w, out=w * 4, stride=stride,
                        shortcut=(bi == 0), dtype=self.dtype,
                        name=f"layer{li + 1}_block{bi + 1}")(x, train_bn)
                else:
                    x = BasicBlock(features=w, stride=stride,
                                   shortcut=(bi == 0 and li > 0),
                                   dtype=self.dtype,
                                   name=f"layer{li + 1}_block{bi + 1}")(
                        x, train_bn)
        return x

    def conv_info(self):
        info = ConvInfo()
        info.add(7, 2, 3)
        info.add(3, 2, 1)  # maxpool
        for li, n in enumerate(self.n_blocks):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                if self.bottleneck:
                    info.add(1, 1, 0)
                    info.add(3, stride, 1)
                    info.add(1, 1, 0)
                else:
                    info.add(3, stride, 1)
                    info.add(3, 1, 1)
        return info.tuple()


def resnet18_features(pretrained=False, dtype=jnp.float32, **kw):
    return ResNetFeatures((2, 2, 2, 2), False, dtype), 512, ()


def resnet34_features(pretrained=False, dtype=jnp.float32, **kw):
    return ResNetFeatures((3, 4, 6, 3), False, dtype), 512, ()


def resnet50_features(pretrained=False, dtype=jnp.float32, **kw):
    return ResNetFeatures((3, 4, 6, 3), True, dtype), 2048, ()


def resnet101_features(pretrained=False, dtype=jnp.float32, **kw):
    return ResNetFeatures((3, 4, 23, 3), True, dtype), 2048, ()


def resnet152_features(pretrained=False, dtype=jnp.float32, **kw):
    return ResNetFeatures((3, 8, 36, 3), True, dtype), 2048, ()


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------
_VGG_CFG = {
    11: (1, 1, 2, 2, 2),
    13: (2, 2, 2, 2, 2),
    16: (2, 2, 3, 3, 3),
    19: (2, 2, 4, 4, 4),
}
_VGG_WIDTHS = (64, 128, 256, 512, 512)


class VGGFeatures(nn.Module):
    depth: int
    batch_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        for bi, n in enumerate(_VGG_CFG[self.depth]):
            for ci in range(n):
                if self.batch_norm:
                    x = ConvBN(_VGG_WIDTHS[bi], (3, 3), dtype=self.dtype,
                               name=f"block{bi + 1}_conv{ci + 1}")(
                        x, train_bn)
                else:
                    x = nn.Conv(_VGG_WIDTHS[bi], (3, 3),
                                padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"block{bi + 1}_conv{ci + 1}")(x)
                    x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x

    def conv_info(self):
        info = ConvInfo()
        for n in _VGG_CFG[self.depth]:
            for _ in range(n):
                info.add(3, 1, 1)
            info.add(2, 2, 0)  # maxpool
        return info.tuple()


def _vgg(depth, bn):
    def factory(pretrained=False, dtype=jnp.float32, **kw):
        return VGGFeatures(depth, batch_norm=bn, dtype=dtype), 512, ()
    return factory


vgg11_features = _vgg(11, False)
vgg11_bn_features = _vgg(11, True)
vgg13_features = _vgg(13, False)
vgg13_bn_features = _vgg(13, True)
vgg16_features = _vgg(16, False)
vgg16_bn_features = _vgg(16, True)
vgg19_features = _vgg(19, False)
vgg19_bn_features = _vgg(19, True)


# ---------------------------------------------------------------------------
# DenseNet
# ---------------------------------------------------------------------------
_DENSE_CFG = {
    121: ((6, 12, 24, 16), 32, 64),
    169: ((6, 12, 32, 32), 32, 64),
    201: ((6, 12, 48, 32), 32, 64),
    161: ((6, 12, 36, 24), 48, 96),
}


class DenseLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = nn.BatchNorm(use_running_average=not train_bn,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train_bn,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseNetFeatures(nn.Module):
    depth: int = 121
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        blocks, growth, init = _DENSE_CFG[self.depth]
        x = ConvBN(init, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   dtype=self.dtype, name="stem")(x, train_bn)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        ch = init
        for bi, n in enumerate(blocks):
            for li in range(n):
                x = DenseLayer(growth, dtype=self.dtype,
                               name=f"dense{bi + 1}_layer{li + 1}")(
                    x, train_bn)
                ch += growth
            if bi < len(blocks) - 1:
                ch = ch // 2
                x = nn.BatchNorm(use_running_average=not train_bn,
                                 dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"trans{bi + 1}_bn")(x)
                x = nn.relu(x)
                x = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"trans{bi + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train_bn,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_bn")(x)
        return nn.relu(x)

    def conv_info(self):
        blocks, _, _ = _DENSE_CFG[self.depth]
        info = ConvInfo()
        info.add(7, 2, 3)
        info.add(3, 2, 1)
        for bi, n in enumerate(blocks):
            for _ in range(n):
                info.add(1, 1, 0)
                info.add(3, 1, 1)
            if bi < len(blocks) - 1:
                info.add(1, 1, 0)
                info.add(2, 2, 0)
        return info.tuple()


def _densenet(depth):
    out = {121: 1024, 161: 2208, 169: 1664, 201: 1920}[depth]

    def factory(pretrained=False, dtype=jnp.float32, **kw):
        return DenseNetFeatures(depth, dtype=dtype), out, ()
    return factory


densenet121_features = _densenet(121)
densenet161_features = _densenet(161)
densenet169_features = _densenet(169)
densenet201_features = _densenet(201)


# ---------------------------------------------------------------------------
# DeepLab VGG16 variants (submodule contract, deeplab_features.py:80-84,
# 132-139): dilated VGG16 (OS 8) + sum/concat ASPP.
# ---------------------------------------------------------------------------
class DeepLabVGG16(nn.Module):
    n_out: int
    atrous_rates: Tuple[int, ...] = (6, 12, 18, 24)
    aspp_mode: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        cfg = _VGG_CFG[16]
        dilations = (1, 1, 1, 1, 2)
        pool_strides = (2, 2, 2, 1, 1)
        for bi, n in enumerate(cfg):
            for ci in range(n):
                d = dilations[bi]
                x = nn.Conv(_VGG_WIDTHS[bi], (3, 3),
                            kernel_dilation=(d, d),
                            padding=[(d, d), (d, d)], dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"block{bi + 1}_conv{ci + 1}")(x)
                x = nn.relu(x)
            s = pool_strides[bi]
            x = max_pool_ceil(x, 3, s, 1) if s > 1 else \
                max_pool_ceil(x, 3, 1, 1)
        return ASPP(self.n_out, self.atrous_rates, self.aspp_mode,
                    dtype=self.dtype, name="aspp")(x)


# ---------------------------------------------------------------------------
# DeepLabV3 multiscale (submodule contract, deeplab_features.py:142-155):
# dilated ResNet with multi-grid final stage; 4 head branches (one 1x1 +
# three 3x3 atrous), each BN+ReLU, concatenated -> 4 "scales".
# ---------------------------------------------------------------------------
class DeepLabV3Scale(nn.Module):
    n_out: int
    n_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    atrous_rates: Tuple[int, ...] = (6, 12, 18)
    multi_grids: Tuple[int, ...] = (1, 2, 4)
    output_stride: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        if self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        ch = [64 * 2 ** p for p in range(6)]
        x = Stem(out=ch[0], dtype=self.dtype, name="layer1")(x, train_bn)
        for i in range(3):
            x = ResLayer(self.n_blocks[i], ch[i], ch[i + 2], strides[i],
                         dilations[i], dtype=self.dtype,
                         name=f"layer{i + 2}")(x, train_bn)
        # final stage with multi-grid dilations
        for bi in range(self.n_blocks[3]):
            d = dilations[3] * self.multi_grids[bi % len(self.multi_grids)]
            x = Bottleneck(mid=ch[3], out=ch[5],
                           stride=strides[3] if bi == 0 else 1,
                           dilation=d, shortcut=(bi == 0),
                           dtype=self.dtype,
                           name=f"layer5_block{bi + 1}")(x, train_bn)
        branches = [ConvBN(self.n_out, (1, 1), dtype=self.dtype,
                           name="head_c0")(x, train_bn)]
        for i, r in enumerate(self.atrous_rates):
            branches.append(
                ConvBN(self.n_out, (3, 3), dilation=(r, r),
                       dtype=self.dtype,
                       name=f"head_c{i + 1}")(x, train_bn))
        return jnp.concatenate(branches, axis=-1)
