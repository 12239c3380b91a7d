"""Dynamic int8 (w8a8) convolution for inference serving.

TPU v5e executes int8 x int8 -> int32 on the MXU at 2x the bf16 rate
(394.5 TOPS vs 197 TFLOPS dense peak) and int8 activations halve HBM
traffic, so a quantized backbone roughly doubles the compute-bound
layers' throughput.  This module implements *dynamic* symmetric
quantization — no calibration dataset, no extra state:

- activations: one per-tensor scale ``max|x| / 127`` computed on device
  per call (XLA fuses the max-reduce into the producer's epilogue);
- weights: per-output-channel scales (standard for convs — channels'
  ranges differ by orders of magnitude after BN folding upstream);
- accumulation: int32 on the MXU, dequantized once into fp32.

Inference-only by construction (a round() has no useful gradient): the
backbone enables it behind the construction-time ``quant8=True`` flag
(set only by ``model_loading.load_model`` for serving), and
``train.steps.make_train_step`` refuses quant8 models outright.
The reference has no quantized path — this is TPU-serving surface
beyond parity (cf. SURVEY.md §6: the reference publishes no perf
numbers at all).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def quantize_symmetric(x: jax.Array, axis=None
                       ) -> Tuple[jax.Array, jax.Array]:
    """(int8 values, fp32 scale) with ``x ~= values * scale``.

    ``axis=None`` -> one per-tensor scale; an axis tuple keeps those
    axes (per-channel: reduce over all but the channel axis).
    """
    xf = x.astype(jnp.float32)
    if axis is None:
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax, 1e-12) / 127.0
        shaped = scale
    else:
        keep = (axis,) if isinstance(axis, int) else tuple(axis)
        reduce_axes = tuple(i for i in range(x.ndim) if i not in keep)
        amax = jnp.max(jnp.abs(xf), axis=reduce_axes)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        shaped = jnp.expand_dims(scale, reduce_axes)
    q = jnp.clip(jnp.round(xf / shaped), -127, 127).astype(jnp.int8)
    return q, scale


def dynamic_int8_conv(x: jax.Array, kernel: jax.Array, *,
                      strides: Sequence[int] = (1, 1),
                      padding="SAME",
                      dilation: Optional[Sequence[int]] = None
                      ) -> jax.Array:
    """NHWC/HWIO conv with both operands dynamically quantized to int8.

    Returns fp32 ``conv(x, kernel)`` up to quantization error: the
    int32 accumulator is exact, so the only error is the input/weight
    rounding (~0.4% RMS each for smooth distributions).  Weight
    quantization is per-output-channel; it constant-folds when the
    kernel is a literal and costs one HBM read of the (small) kernel
    otherwise.
    """
    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(kernel, axis=3)       # (O,)
    out = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        rhs_dilation=None if dilation is None else tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * (sx * sw)
