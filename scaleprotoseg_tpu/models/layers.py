"""Shared NHWC conv building blocks.

TPU-first conventions: NHWC activations, fp32 parameters, configurable
computation dtype (bf16 on TPU), explicit torch-compatible padding so
feature-map shapes match the reference stack exactly (output-stride 8 on
a 513 crop -> 65x65 grid; 1024x2048 -> 129x257).

BatchNorm: the reference freezes all pretrained BN every training step
(`segmentation/utils.py:127-136` + `module_multiscale.py:194`) and its
optimizers never include BN affine params (`utils.py:47-68` yields conv
weights only).  The exact TPU equivalent is inference-mode BN with
constant statistics — implemented here as a scale/offset transform whose
statistics live in the ``batch_stats`` collection.  UNet paths
(`freeze_type='none'``) use trainable BN with running-stat updates.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _S2DStemConv(nn.Module):
    """7x7/2 conv with nn.Conv-compatible params, computed space-to-depth."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features))
        return conv7x7s2_space_to_depth(
            x.astype(self.dtype), kernel.astype(self.dtype),
            dtype=jnp.float32).astype(self.dtype)


class _QuantConv(nn.Module):
    """nn.Conv-compatible params (``kernel`` HWIO, no bias), computed as
    a w8a8 int8 convolution (`ops/quant.py`).  Same tree path as the fp
    conv, so any checkpoint loads into either form.

    ``static=False`` (dynamic): per-call activation scale — extra HBM
    passes per conv (the round-3 net loss; ops/quant.py).
    ``static=True``: the activation scale lives in the
    ``quant_scales`` variable collection.  When that collection is
    MUTABLE (a calibration pass: ``model.apply(..,
    mutable=["quant_scales"])``), the module computes the full-precision
    conv, folds ``max|x|/127`` into the running scale, and the caller
    threads the updated collection into the next calibration batch.
    When immutable (serving), the conv runs int8 with the calibrated
    scale and the quantize fuses into the producer's epilogue."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    dilation: Tuple[int, int]
    padding: Sequence[Tuple[int, int]]
    dtype: jnp.dtype = jnp.float32
    static: bool = False

    @nn.compact
    def __call__(self, x):
        from scaleprotoseg_tpu.ops.quant import (dynamic_int8_conv,
                                                 static_int8_conv)
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        if not self.static:
            return dynamic_int8_conv(x, kernel, strides=self.strides,
                                     padding=list(self.padding),
                                     dilation=self.dilation,
                                     out_dtype=self.dtype)
        scale = self.variable("quant_scales", "x_scale",
                              lambda: jnp.zeros((), jnp.float32))
        if self.is_mutable_collection("quant_scales"):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            scale.value = jnp.maximum(scale.value, amax / 127.0)
            # calibration runs the full-precision conv: downstream
            # sites must calibrate on the reference activations, not
            # on half-quantized ones
            return jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), self.strides,
                list(self.padding), rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return static_int8_conv(x, kernel, scale.value,
                                strides=self.strides,
                                padding=list(self.padding),
                                dilation=self.dilation,
                                out_dtype=self.dtype)


class _FastGradConv(nn.Module):
    """nn.Conv-compatible params (``kernel`` HWIO, no bias), computed by
    ``ops.gradconv.conv3x3_dilated`` — the same forward conv with a
    shifted-matmul custom-VJP backward (2-4x XLA's dilated grad-conv
    lowering on v5e; exact math, measured in bench_gradconv.py)."""

    features: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from scaleprotoseg_tpu.ops.gradconv import conv3x3_dilated
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        return conv3x3_dilated(x.astype(self.dtype),
                               kernel.astype(self.dtype), self.dilation)


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU (torch _ConvBnReLU equivalent).

    ``s2d_stem=True`` (7x7/2 convs only) computes the conv via
    space-to-depth — same parameters, ~2x faster for RGB stems on TPU.
    ``quant8=True`` (inference serving) computes the conv in dynamic
    w8a8 int8 on the MXU; ``quant8="static"`` uses a calibrated
    per-site activation scale instead — the quantize then fuses into
    the producer's epilogue (the speed path; ops/quant.py).  Identical
    param tree either way.
    ``fast_grad=True`` (3x3 stride-1 dilated convs only) swaps in the
    shifted-matmul backward (`ops/gradconv.py`) — a training-speed
    knob; forward numerics are identical (same conv op).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Optional[Sequence[Tuple[int, int]]] = None
    relu: bool = True
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = False
    quant8: bool | str = False           # False | True (dynamic) | "static"
    fast_grad: bool = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        if self.s2d_stem:
            assert self.kernel_size == (7, 7) and self.strides == (2, 2)
            x = _S2DStemConv(self.features, dtype=self.dtype,
                             name="conv")(x)
            x = nn.BatchNorm(use_running_average=not train_bn,
                             momentum=0.999, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn")(x)
            return nn.relu(x) if self.relu else x
        if self.padding is None:
            kh, kw = self.kernel_size
            dh, dw = self.dilation
            pad = [((kh - 1) * dh // 2,) * 2, ((kw - 1) * dw // 2,) * 2]
        else:
            pad = list(self.padding)
        if self.quant8:
            x = _QuantConv(self.features, self.kernel_size,
                           strides=self.strides, dilation=self.dilation,
                           padding=pad, dtype=self.dtype,
                           static=(self.quant8 == "static"),
                           name="conv")(x)
        elif (self.fast_grad and self.kernel_size == (3, 3)
              and self.strides == (1, 1)
              and self.dilation[0] == self.dilation[1]
              and pad == [(self.dilation[0],) * 2] * 2):
            x = _FastGradConv(self.features, self.dilation[0],
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, self.kernel_size,
                        strides=self.strides,
                        kernel_dilation=self.dilation, padding=pad,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.999,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


def conv7x7s2_space_to_depth(x, kernel, dtype=jnp.float32):
    """7x7 stride-2 pad-3 convolution via space-to-depth.

    Rearranges the input into 2x2 blocks (C -> 4C) and applies an
    equivalent 4x4 stride-1 convolution: identical math, but the MXU sees
    4x more input channels and no strided window — measured ~2x faster
    than the direct form for the RGB stem on TPU v5e.

    Derivation: o(y,x) = sum_{i,j<7} X[2y+i-3, 2x+j-3] K[i,j].  With Xp =
    pad(X, 4) and i+1 = 2q+bi (q<4, bi<2): X[2y+i-3] = Xp[2(y+q)+bi], so
    o = sum_{q,r} X2[y+q, x+r, (bi,bj,c)] K2[q,r,(bi,bj,c)] where
    K2[q,r,bi,bj] = K9[2q+bi, 2r+bj] and K9 is K zero-embedded at [1:8].
    """
    import jax

    b, h, w, c = x.shape
    f = kernel.shape[-1]
    # even spatial dims for the 2x2 blocking (zero pad == conv zero pad)
    he, we = h + (h % 2), w + (w % 2)
    out_h, out_w = -(-h // 2), -(-w // 2)

    k9 = jnp.zeros((9, 9, c, f), kernel.dtype).at[1:8, 1:8].set(kernel)
    k2 = k9[:8, :8].reshape(4, 2, 4, 2, c, f) \
        .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, f)

    xp = jnp.pad(x, ((0, 0), (4, 4 + he - h), (4, 4 + we - w), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    x2 = xp.reshape(b, hp // 2, 2, wp // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)

    out = jax.lax.conv_general_dilated(
        x2, k2.astype(x2.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    return out[:, :out_h, :out_w]


def max_pool_ceil(x, window: int, strides: int, padding: int):
    """torch MaxPool2d(..., ceil_mode=True) on NHWC inputs.

    Emulates ceil-mode by adding extra -inf padding on the bottom/right
    when the window grid does not divide evenly (static-shape arithmetic,
    so fully jit-compatible)."""
    pads = []
    for dim in (1, 2):
        h = x.shape[dim]
        out = -(-(h + 2 * padding - window) // strides) + 1  # ceil division
        # torch drops the last window if it would start entirely inside the
        # right padding
        if (out - 1) * strides >= h + padding:
            out -= 1
        needed = (out - 1) * strides + window
        pads.append((padding, padding + max(needed - h - 2 * padding, 0)))
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else np.iinfo(np.int32).min
    x = jnp.pad(x, [(0, 0), pads[0], pads[1], (0, 0)],
                constant_values=neg)
    return nn.max_pool(x, (window, window), strides=(strides, strides),
                       padding="VALID")
