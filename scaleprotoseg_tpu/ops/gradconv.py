"""Dilated 3x3 conv with a shifted-matmul backward (custom VJP).

XLA's conv-gradient lowering underperforms on v5e for the backbone's
DILATED 3x3 convs (layer4 d=2, layer5 d=4 — 84% of the model FLOPs):
`benchmarks/bench_gradconv.py` measures the weight grad at ~3.4 and the
input grad at ~4.0 TFLOP/s for layer5 shapes, while the SAME math
re-expressed as nine shifted pointwise matmuls (pure MXU contractions
over the pixel axis, the transpose trick the fused ASPP VJP already
uses in `ops/pallas_aspp.py`) runs 2-4x faster.  This module wraps
`lax.conv_general_dilated` (whose FORWARD is already near-roofline,
131-146 TFLOP/s in-model) in a `jax.custom_vjp` that computes both
gradients in the matmul form.

Math (stride 1, same-padding p=d, zero pad; k indexes the 3x3 taps):

    y[q]  = sum_k x[q + (k-1)d] W[k]
    dW[k] = sum_q x[q + (k-1)d]^T dy[q]      (pixel-axis contraction)
    dx[q] = sum_k dy[q - (k-1)d] W[k]^T      (opposite shifts)

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
    cout = dy.shape[-1]

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

    # dX += shift(dY @ W[ky,kx]^T) with the opposite shift per tap
    dyp = jnp.pad(dy, ((0, 0), (d, d), (d, d), (0, 0)))
    dx = None
    for ky in range(3):
        for kx in range(3):
            ds = lax.dynamic_slice(dyp, (0, (2 - ky) * d, (2 - kx) * d, 0),
                                   (b, h, w_, cout))
            t = jnp.einsum("bhwo,co->bhwc", ds, w[ky, kx],
                           preferred_element_type=jnp.float32)
            dx = t if dx is None else dx + t
    return dx.astype(x.dtype), dw


conv3x3_dilated.defvjp(_fwd, _bwd)
