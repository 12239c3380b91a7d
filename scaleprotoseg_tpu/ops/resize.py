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


def _nearest_index(out_size: int, in_size: int) -> np.ndarray:
    """PIL-NEAREST source index for each output pixel."""
    scale = in_size / out_size
    idx = np.floor((np.arange(out_size) + 0.5) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


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
    """Bilinear resize of (..., H, W, C) matching torch align_corners=False."""
    out_shape = x.shape[:-3] + (height, width, x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear")
