"""Resize ops with exact reference semantics.

Parity-critical (SURVEY.md §7 risks):

- Label resize must replicate PIL ``Image.resize(..., NEAREST)`` — output
  pixel ``i`` samples input coordinate ``floor((i + 0.5) * in/out)``
  (PIL pixel-center convention).  The reference insists on PIL because
  cv2 / ``F.interpolate`` misalign (`segmentation/data/dataset.py:22-30`).
- Logit/distance upsampling uses torch ``F.interpolate(mode='bilinear',
  align_corners=False)`` (`eval_valid_multiscale.py:229-230`), which is the
  same half-pixel-center convention as ``jax.image.resize('linear')``.

The nearest path is implemented as two integer gathers — exact, jittable,
and far cheaper than a general resample.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


from functools import lru_cache


@lru_cache(maxsize=4096)
def _nearest_index_cached(out_size: int, in_size: int) -> tuple:
    """PIL-NEAREST source index for each output pixel.

    Derived from PIL itself (resizing an identity ramp): the analytic
    ``floor((i + 0.5) * in/out)`` rule disagrees with PIL at centers that
    hit exact pixel boundaries, and PIL's tie-breaking is not a simple
    closed form — sampling PIL guarantees parity for every size pair.
    """
    from PIL import Image

    ramp = np.arange(in_size, dtype=np.float64)[None, :].repeat(2, axis=0)
    out = np.asarray(Image.fromarray(ramp).resize((out_size, 2),
                                                  Image.NEAREST))[0]
    idx = np.clip(out.astype(np.int64), 0, in_size - 1)
    return tuple(int(i) for i in idx)


def _nearest_index(out_size: int, in_size: int) -> np.ndarray:
    return np.asarray(_nearest_index_cached(out_size, in_size),
                      dtype=np.int64)


def resize_label_nearest_np(label: np.ndarray,
                            size: Tuple[int, int]) -> np.ndarray:
    """Host-side PIL-compatible nearest label resize.

    Args:
      label: (H, W) integer label map.
      size: (width, height) — PIL argument order, as in the reference's
        ``resize_label(label, size=(W, H))``.
    """
    w, h = size
    iy = _nearest_index(h, label.shape[0])
    ix = _nearest_index(w, label.shape[1])
    return label[np.ix_(iy, ix)]


def resize_label_nearest(label: jax.Array, height: int,
                         width: int) -> jax.Array:
    """Jittable PIL-compatible nearest label resize for (..., H, W) maps."""
    in_h, in_w = label.shape[-2], label.shape[-1]
    iy = jnp.asarray(_nearest_index(height, in_h))
    ix = jnp.asarray(_nearest_index(width, in_w))
    return label[..., iy, :][..., ix]


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C) matching torch
    ``F.interpolate(mode='bilinear', align_corners=False)``.

    ``antialias=False`` is parity-critical on DOWNSCALES (the MSC input
    pyramid, utils.py:96-101): torch's interpolate never antialiases,
    while jax.image.resize defaults to a widened antialiasing kernel
    when shrinking — pinned by the MSC trajectory-parity test."""
    out_shape = x.shape[:-3] + (height, width, x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear",
                            antialias=False)


@lru_cache(maxsize=512)
def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix for the align_corners=False
    size-based grid ``src = (dst + 0.5) * in/out - 0.5`` — the same
    sampling grid as ``resize_bilinear``/torch ``F.interpolate``; each
    row holds the two-tap lerp weights.  Returns NUMPY (a cached jnp
    array would leak a tracer out of its creating trace)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.clip((dst + 0.5) * (in_size / out_size) - 0.5,
                  0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    t = src - lo
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += (1 - t).astype(np.float32)
    m[np.arange(out_size), hi] += t.astype(np.float32)
    return m


def resize_bilinear_matrix(x: jax.Array, height: int,
                           width: int) -> jax.Array:
    """MXU-form twin of ``resize_bilinear``: the two separable
    interpolations applied as dense einsums (one big matmul per axis)
    instead of ``jax.image.resize``'s per-axis gather/contraction.

    Same sampling grid, fp32 accumulation; values agree with
    ``resize_bilinear`` to fp32 roundoff (summation order differs, so
    not bit-equal — parity-tested to 1e-5 in test_spec_and_ops).  Used
    by the serving upsample, where the ``jax.image`` lowering measured
    ~17 ms/image at Cityscapes resolution on v5e — more than half the
    whole ResNet-101 forward (`benchmarks/bench_serving.py`)."""
    my = jnp.asarray(_bilinear_matrix(height, x.shape[-3]))
    mx = jnp.asarray(_bilinear_matrix(width, x.shape[-2]))
    y = jnp.einsum("oh,...hwc->...owc", my, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", mx, y)
    return y


def resize_bilinear_factor(x: jax.Array, factor: float) -> jax.Array:
    """Bilinear resize matching torch ``F.interpolate(x, scale_factor=p,
    align_corners=False, recompute_scale_factor=False)``.

    Parity-critical for the MSC input pyramid (ref utils.py:101): with a
    ``scale_factor``, torch maps output pixel o to input coordinate
    ``(o + 0.5)/p - 0.5`` using EXACTLY ``1/p`` — not in_size/out_size —
    so for odd sizes (513 -> 256) the sampling grid differs from a
    size-based resize.  Implemented as two separable 1-D interpolation
    matrices applied by einsum (dense, exact; the op runs on 3-channel
    input images, so the matrices are negligible)."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = int(h * factor), int(w * factor)

    def interp_matrix(out_size, in_size):
        dst = np.arange(out_size, dtype=np.float64)
        src = np.clip((dst + 0.5) / factor - 0.5, 0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        t = src - lo
        m = np.zeros((out_size, in_size), np.float32)
        m[np.arange(out_size), lo] += (1 - t)
        m[np.arange(out_size), hi] += t
        return jnp.asarray(m)

    my = interp_matrix(out_h, h)
    mx = interp_matrix(out_w, w)
    y = jnp.einsum("oh,...hwc->...owc", my, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", mx, y)
    return y.astype(x.dtype)


def bilinear_sample(arr: jax.Array, rows: jax.Array, cols: jax.Array,
                    out_h: int, out_w: int) -> jax.Array:
    """Jittable batched twin of ``bilinear_sample_np``: values of the
    align_corners=False bilinear upsample of ``arr`` (B, H, W, C) to
    (out_h, out_w) at integer output pixels ``rows``/``cols`` (B, n),
    without materializing the upsampled volume (at Cityscapes label
    resolution that is 2M x P floats per image).  Used by the on-device
    full-split purity accumulation (ref eval_valid_multiscale.py:255-269).
    """
    h, w = arr.shape[1], arr.shape[2]
    sy = jnp.clip((rows.astype(jnp.float32) + 0.5) * (h / out_h) - 0.5,
                  0, h - 1)
    sx = jnp.clip((cols.astype(jnp.float32) + 0.5) * (w / out_w) - 0.5,
                  0, w - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    def gather(a, r, c):
        return a[r, c]                                   # (n, C)

    g = jax.vmap(gather)
    return (g(arr, y0, x0) * (1 - wy) * (1 - wx) +
            g(arr, y0, x1) * (1 - wy) * wx +
            g(arr, y1, x0) * wy * (1 - wx) +
            g(arr, y1, x1) * wy * wx)


def bilinear_sample_np(arr: np.ndarray, rows: np.ndarray, cols: np.ndarray,
                       out_h: int, out_w: int) -> np.ndarray:
    """Values of the ``align_corners=False`` bilinear upsample of ``arr``
    (H, W, C) to (out_h, out_w) at the integer output pixels (rows, cols),
    computed directly from the source grid — identical to
    ``F.interpolate(..., mode='bilinear', align_corners=False)`` followed
    by indexing, without materializing the (out_h, out_w, C) tensor (at
    Cityscapes label resolution that would be 2M x P floats per image).
    """
    h, w = arr.shape[:2]
    sy = np.clip((np.asarray(rows, np.float64) + 0.5) * (h / out_h) - 0.5,
                 0, h - 1)
    sx = np.clip((np.asarray(cols, np.float64) + 0.5) * (w / out_w) - 0.5,
                 0, w - 1)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[:, None]
    wx = (sx - x0)[:, None]
    return (arr[y0, x0] * (1 - wy) * (1 - wx) +
            arr[y0, x1] * (1 - wy) * wx +
            arr[y1, x0] * wy * (1 - wx) +
            arr[y1, x1] * wy * wx)
