"""DeepLabV2 dilated-ResNet backbone with sum/concat ASPP heads.

TPU-native (NHWC, bf16-capable) re-design of the reference's missing
`deeplab_pytorch` submodule surface (SURVEY.md §2.3): a COCO-style dilated
ResNet (stem ``layer1``, res-layers ``layer2..layer5`` with bottleneck
units named ``reduce``/``conv3x3``/``increase``/``shortcut`` — the naming
is pinned by the torchvision key remap at
`segmentation/model/deeplab_features.py:18-60`) followed by an ASPP head
with four parallel 3x3 atrous branches ``c0..c3``
(`module_multiscale.py:398-407`):

- ``aspp_mode='sum'``: branch outputs summed — classic DeepLabV2
  (`deeplab_features.py:64-68`), output C = n_out.
- ``aspp_mode='concat'``: branch outputs concatenated — the ScaleProtoSeg
  multiscale head (`deeplab_features.py:113-119`); each atrous rate is one
  "scale", output C = len(rates) * n_out, scale s occupies channels
  ``[s*n_out, (s+1)*n_out)`` (fine rate 6 first).

Output stride is 8: layer3 strides 2, layer4/5 use dilation 2/4.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.layers import ConvBN, max_pool_ceil


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 (dilated) -> 1x1 increase, projection shortcut on
    the first block of a layer.  Stride lives on the reduce conv (COCO/caffe
    convention, matching the reference weight layout)."""

    mid: int
    out: int
    stride: int
    dilation: int
    shortcut: bool
    dtype: jnp.dtype = jnp.float32
    quant8: bool | str = False
    fast_grad: bool = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = ConvBN(self.mid, (1, 1), strides=(self.stride,) * 2,
                   dtype=self.dtype, quant8=self.quant8,
                   name="reduce")(x, train_bn)
        h = ConvBN(self.mid, (3, 3), dilation=(self.dilation,) * 2,
                   dtype=self.dtype, quant8=self.quant8,
                   fast_grad=self.fast_grad, name="conv3x3")(h, train_bn)
        h = ConvBN(self.out, (1, 1), relu=False, dtype=self.dtype,
                   quant8=self.quant8, name="increase")(h, train_bn)
        if self.shortcut:
            s = ConvBN(self.out, (1, 1), strides=(self.stride,) * 2,
                       relu=False, dtype=self.dtype, quant8=self.quant8,
                       name="shortcut")(x, train_bn)
        else:
            s = x
        return nn.relu(h + s)


class ResLayer(nn.Module):
    n_blocks: int
    mid: int
    out: int
    stride: int
    dilation: int
    dtype: jnp.dtype = jnp.float32
    quant8: bool | str = False
    fast_grad: bool = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        for i in range(self.n_blocks):
            x = Bottleneck(mid=self.mid, out=self.out,
                           stride=self.stride if i == 0 else 1,
                           dilation=self.dilation, shortcut=(i == 0),
                           dtype=self.dtype, quant8=self.quant8,
                           fast_grad=self.fast_grad,
                           name=f"block{i + 1}")(x, train_bn)
        return x


class Stem(nn.Module):
    """7x7/2 conv + BN + ReLU + 3x3/2 ceil-mode max pool."""

    out: int = 64
    dtype: jnp.dtype = jnp.float32
    quant8: bool | str = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        # NOTE: a space-to-depth stem variant exists (ConvBN(s2d_stem=True));
        # isolated it halves the conv time, but in-module (fused with
        # BN/ReLU/pool) the input rearrangement costs more than it saves
        # on v5e, so the direct form stays.
        x = ConvBN(self.out, (7, 7), strides=(2, 2),
                   padding=((3, 3), (3, 3)), dtype=self.dtype,
                   quant8=self.quant8, name="conv1")(x, train_bn)
        return max_pool_ceil(x, window=3, strides=2, padding=1)


class ASPPBranch(nn.Module):
    """One 3x3 atrous branch with nn.Conv-compatible params
    (``kernel`` HWIO, ``bias``)."""

    n_out: int
    rate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_padded, out_shape, return_params: bool = False):
        n, h, w, c = out_shape
        kernel = self.param("kernel", nn.initializers.normal(0.01),
                            (3, 3, c, self.n_out))
        bias = self.param("bias", nn.initializers.zeros, (self.n_out,))
        if return_params:
            return kernel, bias
        m = (x_padded.shape[1] - h) // 2
        acc = None
        for di in range(3):
            for dj in range(3):
                xs = jax.lax.dynamic_slice(
                    x_padded,
                    (0, m + (di - 1) * self.rate, m + (dj - 1) * self.rate,
                     0), (n, h, w, c))
                t = jnp.einsum("nhwc,co->nhwo", xs.astype(self.dtype),
                               kernel[di, dj].astype(self.dtype),
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc + bias


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: parallel 3x3 atrous convs c0..c3.

    Computed as nine shifted-input pointwise matmuls per branch off one
    shared padded tensor instead of dilated convolutions — XLA executes
    the dilated-conv form as four bandwidth-bound passes over the large
    input, measured 1.8x slower on TPU v5e at Cityscapes shapes
    (benchmarks/microbench.py).  Identical math; parameters match
    nn.Conv's (HWIO ``kernel`` + ``bias`` under ``c{i}``), so
    checkpoints/converters are unaffected.  The caffe DeepLab head init
    (normal 0.01, zero bias) is used.  A fully fused single-pass Pallas
    variant lives in ``ops/pallas_aspp.py``.

    ``mode='concat_plus'`` is the ``DeepLabV2ScalePlus`` reconstruction
    (the defining ``deeplabv2_multiscaleplus.py`` lives in the reference's
    MISSING ``deeplab_pytorch`` submodule — only the factory signature
    survives, `deeplab_features.py:159-165`, unused by every shipped
    config): concat ASPP whose branches are each augmented with an
    image-level context projection (global average pool -> per-branch 1x1,
    DeepLabv3-style image pooling folded per scale), preserving the
    4 * n_out channel layout and scale semantics.
    """

    n_out: int
    rates: Sequence[int]
    mode: str  # 'sum' | 'concat' | 'concat_plus'
    dtype: jnp.dtype = jnp.float32
    fast: bool = False  # fused one-pass Pallas kernel (inference-only)

    @nn.compact
    def __call__(self, x):
        # SCALEPROTOSEG_FORCE_FAST_ASPP=interpret runs the fused kernel in
        # Pallas interpret mode off-TPU (test hook for this branch).
        import os
        force = os.environ.get("SCALEPROTOSEG_FORCE_FAST_ASPP", "")
        if (self.fast and self.mode in ("sum", "concat")
                and self.dtype == jnp.bfloat16  # kernel computes in bf16
                and not self.is_initializing()
                and (jax.default_backend() == "tpu" or force)):
            # fused_aspp_trainable == the raw kernel in the forward; its
            # custom VJP (manual shifted-matmul transpose) makes the fast
            # path differentiable, so training can use it too.
            from scaleprotoseg_tpu.ops.pallas_aspp import (
                fused_aspp_trainable)
            params = [
                ASPPBranch(self.n_out, r, dtype=self.dtype, name=f"c{i}")(
                    x, x.shape, return_params=True)
                for i, r in enumerate(self.rates)
            ]
            y = fused_aspp_trainable(
                x.astype(jnp.bfloat16),
                [k for k, _ in params], [b for _, b in params],
                rates=tuple(self.rates),
                interpret=(force == "interpret"))
            if self.mode == "sum":
                y = y.astype(jnp.float32).reshape(
                    *y.shape[:-1], len(self.rates), self.n_out).sum(-2)
                return y
            # match the XLA path's fp32 result dtype (einsum accumulates
            # fp32) so fast=True does not perturb downstream numerics
            return y.astype(jnp.float32)
        m = max(self.rates)
        xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)))
        branches = [
            ASPPBranch(self.n_out, r, dtype=self.dtype, name=f"c{i}")(
                xp, x.shape)
            for i, r in enumerate(self.rates)
        ]
        if self.mode == "concat_plus":
            gap = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
            branches = [
                b + nn.Dense(self.n_out, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"c{i}_pool")(gap.astype(self.dtype))
                for i, b in enumerate(branches)
            ]
            return jnp.concatenate(branches, axis=-1)
        if self.mode == "sum":
            out = branches[0]
            for b in branches[1:]:
                out = out + b
            return out
        if self.mode == "concat":
            return jnp.concatenate(branches, axis=-1)
        raise ValueError(f"Unknown ASPP mode: {self.mode}")


class DeepLabV2(nn.Module):
    """Dilated ResNet + ASPP feature extractor (output stride 8).

    ``n_blocks=(3, 4, 23, 3)`` -> ResNet-101, ``(3, 4, 6, 3)`` -> ResNet-50.
    Returns NHWC features: (B, ceil(H/8)+pad, ceil(W/8)+pad, C_out) where
    C_out = n_out for 'sum' and len(rates)*n_out for 'concat'.
    """

    n_out: int
    n_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    atrous_rates: Tuple[int, ...] = (6, 12, 18, 24)
    aspp_mode: str = "concat"
    dtype: jnp.dtype = jnp.float32
    # fused one-pass Pallas ASPP (1.6x the XLA head on v5e).  Fully
    # differentiable via a custom VJP (ops/pallas_aspp.py), so usable in
    # training too; default False keeps the parity-tested XLA form.
    fast_aspp: bool = False
    # w8a8 int8 ResNet convs (inference serving only; the ASPP stays
    # bf16).  False | True (dynamic per-call activation scales) |
    # "static" (calibrated per-site scales in the ``quant_scales``
    # collection — the SPEED path: XLA's s8 conv lowering runs
    # 1.44-1.78x bf16 at serving shapes, and with static scales the
    # quantize fuses into the producer's epilogue instead of costing
    # 1-2 extra HBM passes per conv; measured numbers + calibration
    # protocol in ops/quant.py / models/layers.py).  Applied to the
    # DILATED layers only (layer4/5 — 84% of the FLOPs): the
    # HBM-bound stem/layer2/3 gain nothing from MXU-rate wins.
    # Composition: DYNAMIC (True) must NOT combine with fast_aspp or
    # any downstream Pallas call — the dynamic quantize's layout flip
    # forces relayouts at every Pallas operand-layout constraint, a
    # measured 3x whole-model cliff (load_model and make_serving_fn
    # enforce the fully-XLA path for it).  STATIC composes cliff-free
    # with the full Pallas fast path — the fastest measured serving
    # config (40.5 img/s; benchmarks/bench_quant_static2.py).
    # Identical param tree either way; any checkpoint loads.
    quant8: bool | str = False
    # shifted-matmul custom-VJP backward for the DILATED 3x3 convs
    # (layer4/5 conv3x3 — where XLA's grad-conv lowering measures 2-4x
    # below the matmul form, benchmarks/bench_gradconv.py).  Forward
    # numerics identical (same conv op); a training-speed knob
    # (`train.fast_gradconv`).  The d=1 convs in layer2/3 stay on
    # XLA's lowering, which is already at its roofline there.
    fast_gradconv: bool = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        # quant8 is a construction-time serving flag (set only by
        # model_loading.load_model); the int8 round() has zero gradient,
        # so make_train_step refuses quant8 models outright — a runtime
        # train_bn gate would miss frozen-BN training phases, where
        # train_bn=False but gradients still flow.
        q8 = self.quant8
        ch = [64 * 2 ** p for p in range(6)]
        x = Stem(out=ch[0], dtype=self.dtype, name="layer1")(x, train_bn)
        x = ResLayer(self.n_blocks[0], ch[0], ch[2], 1, 1,
                     dtype=self.dtype, name="layer2")(x, train_bn)
        x = ResLayer(self.n_blocks[1], ch[1], ch[3], 2, 1,
                     dtype=self.dtype, name="layer3")(x, train_bn)
        x = ResLayer(self.n_blocks[2], ch[2], ch[4], 1, 2,
                     dtype=self.dtype, quant8=q8,
                     fast_grad=self.fast_gradconv,
                     name="layer4")(x, train_bn)
        x = ResLayer(self.n_blocks[3], ch[3], ch[5], 1, 4,
                     dtype=self.dtype, quant8=q8,
                     fast_grad=self.fast_gradconv,
                     name="layer5")(x, train_bn)
        return ASPP(self.n_out, self.atrous_rates, self.aspp_mode,
                    dtype=self.dtype, fast=self.fast_aspp,
                    name="aspp")(x)
