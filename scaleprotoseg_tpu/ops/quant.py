"""Dynamic int8 (w8a8) convolution for inference serving.

TPU v5e's int8 x int8 -> int32 MXU peak is 2x bf16 (394.5 TOPS vs 197
TFLOPS dense), and int8 activations halve HBM traffic.  This module
implements *dynamic* symmetric quantization — no calibration dataset,
no extra state:

- activations: one per-tensor scale ``max|x| / 127`` computed on device
  per call (XLA fuses the max-reduce into the producer's epilogue);
- weights: per-output-channel scales (standard for convs — channels'
  ranges differ by orders of magnitude after BN folding upstream);
- accumulation: int32 on the MXU, dequantized once into the model's
  compute dtype.

Measured reality on v5e (flagship shapes, batch 4): XLA's s8xs8->s32
conv lowering does NOT approach the 2x peak — an isolated layer4 3x3
dil-2 int8 conv runs at ~the bf16 conv's speed (2.93 vs 3.08 ms), a
sustained 20-conv chain at 1.25x — and the per-conv dynamic quantize
adds an activation pass, so quantizing the HBM-bound stem/layer2/3
made the whole model 3x slower; `models/deeplab.py` applies quant8 to
the dilated layer4/5 only (84% of the FLOPs).  Even so the shipped
config is a measured net LOSS vs bf16 (backbone 127 vs 103.5 ms/batch
at 1024x2048): quant8 is an accuracy-verified deployment surface for
memory-constrained serving, not a speed win — see README "int8
serving".  Composition caveat: int8 convs make XLA lay activations
out batch-second-minor, and ANY downstream Pallas custom call's
operand-layout constraint then forces a relayout measured at a 3x
whole-model cliff (fused ASPP: 317 ms; fused head+upsample on an
XLA-ASPP backbone: 382 ms; fully-XLA: 127 ms/batch) —
``model_loading.load_model`` and ``serving.make_serving_fn``
therefore force the fully-XLA path whenever quant8 is on.

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
                      dilation: Optional[Sequence[int]] = None,
                      out_dtype=None) -> jax.Array:
    """NHWC/HWIO conv with both operands dynamically quantized to int8.

    Returns ``conv(x, kernel)`` in ``out_dtype`` (default fp32) up to
    quantization error: the int32 accumulator is exact, so the only
    error is the input/weight rounding (~0.4% RMS each for smooth
    distributions).  Weight quantization is per-output-channel; it
    constant-folds when the kernel is a literal and costs one HBM read
    of the (small) kernel otherwise.  ``out_dtype`` matters for
    throughput: dequantizing into fp32 inside a bf16 model doubles
    every downstream HBM pass (measured on v5e — see the module
    docstring's scoping note).
    """
    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(kernel, axis=3)       # (O,)
    out = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        rhs_dilation=None if dilation is None else tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (sx * sw)
    return out if out_dtype is None else out.astype(out_dtype)
