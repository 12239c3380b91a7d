"""Dilated 3x3 conv with a hybrid custom-VJP backward.

XLA's AD of `lax.conv_general_dilated` computes the WEIGHT grad of the
backbone's dilated 3x3 convs (layer4 d=2, layer5 d=4 — 84% of the
model FLOPs) via its conv-grad lowering, which measures 1.4x slower
than the same contraction written as nine shifted pointwise matmuls
over the pixel axis (64 vs 89 TFLOP/s at layer5 train shapes,
clean-sync `benchmarks/bench_gradconv.py`).  The INPUT grad is the
opposite: XLA's native transpose-conv form (one conv with the
spatially-flipped, IO-swapped kernel) measures 168 vs the mm form's
94 TFLOP/s.  So the custom VJP is hybrid — matmul-form dW, conv-form
dX:

    y[q]  = sum_k x[q + (k-1)d] W[k]
    dW[k] = sum_q x[q + (k-1)d]^T dy[q]      (9 pixel-axis matmuls)
    dx[q] = sum_k dy[q - (k-1)d] W[k]^T      (= conv(dy, rot180(W)^T))

In-model the knob is worth more than the isolated rates suggest
(better fusion with the surrounding BN/ReLU backward): the cityscapes
joint step measured 43.9 -> 40.8 ms from the knob alone, and the full
TPU recipe (bf16 + fast_aspp + fast_gradconv) runs 35.3 vs 38.8
without it over a 1000-step window (`bench_bf16_divergence.py`).

Exact re-expressions — same bf16 operands, fp32 accumulation — so this
is a scheduling change, not an approximation; fp32 parity is pinned in
`tests/test_gradconv.py` and the bf16 train-step trajectory with the
knob on is covered by `benchmarks/bench_bf16_divergence.py`.

Enabled per-model via ``DeepLabV2.fast_gradconv`` (layer4/5 only) and
at train time via the gin knob ``train.fast_gradconv`` (see
`train/runner.py`).  Reference counterpart: the torch backbone's
autograd conv backward, `segmentation/model/deeplab_features.py` (the
reference has no custom backward; this is a TPU-specific schedule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, w, d: int):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_dilated(x, w, dilation: int):
    """Same-padding stride-1 dilated 3x3 conv, NHWC x HWIO -> NHWC."""
    return _conv(x, w, dilation)


def _fwd(x, w, dilation: int):
    return _conv(x, w, dilation), (x, w)


def _bwd(dilation: int, res, dy):
    x, w = res
    d = dilation
    b, h, w_, cin = x.shape

    # dW[ky,kx] = X_shift(ky,kx)^T @ dY over the B*H*W pixel axis
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    rows = []
    for ky in range(3):
        row = []
        for kx in range(3):
            xs = lax.dynamic_slice(xp, (0, ky * d, kx * d, 0),
                                   (b, h, w_, cin))
            row.append(jnp.einsum("bhwc,bhwo->co", xs, dy,
                                  preferred_element_type=jnp.float32))
        rows.append(jnp.stack(row))
    dw = jnp.stack(rows).astype(w.dtype)                # (3, 3, Cin, Cout)

    # dX as ONE native conv with the spatially-flipped, IO-swapped
    # kernel: dx[q] = sum_k dy[q - (k-1)d] W[k]^T == conv(dy, rot180(W)^T)
    # at the same dilation/padding.  XLA's lowering of this form
    # measures FASTER than nine shifted matmuls (168 vs 94 TFLOP/s at
    # layer5 shapes, clean-sync bench_gradconv.py) — the mm form only
    # wins for the WEIGHT grad, so the backward is hybrid.
    w_flip = jnp.swapaxes(w[::-1, ::-1], 2, 3)          # (3,3,Cout,Cin)
    dx = _conv(dy, w_flip, d)
    return dx.astype(x.dtype), dw


conv3x3_dilated.defvjp(_fwd, _bwd)
