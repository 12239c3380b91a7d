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
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU (torch _ConvBnReLU equivalent)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Optional[Sequence[Tuple[int, int]]] = None
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        if self.padding is None:
            kh, kw = self.kernel_size
            dh, dw = self.dilation
            pad = [((kh - 1) * dh // 2,) * 2, ((kw - 1) * dw // 2,) * 2]
        else:
            pad = list(self.padding)
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    kernel_dilation=self.dilation, padding=pad,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.999,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


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
