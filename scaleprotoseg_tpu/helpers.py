"""Small host-side helpers (parity with reference `helpers.py`)."""

from __future__ import annotations

import os

import numpy as np


def makedir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def list_of_distances(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """All-pairs squared L2 distances (ref helpers.py:10-11)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    return ((x[:, None] - y[None]) ** 2).sum(-1)


def find_high_activation_crop(activation_map: np.ndarray,
                              percentile: float = 95):
    """Tight bbox around the top-percentile activation region
    (ref helpers.py:29-50).  Returns (y0, y1, x0, x1), end-exclusive."""
    threshold = np.percentile(activation_map, percentile)
    mask = activation_map >= threshold
    rows = np.nonzero(mask.any(axis=1))[0]
    cols = np.nonzero(mask.any(axis=0))[0]
    if len(rows) == 0:
        return 0, 1, 0, 1
    return int(rows[0]), int(rows[-1]) + 1, int(cols[0]), int(cols[-1]) + 1


def find_continuous_high_activation_crop(activation_map: np.ndarray,
                                         patch_bbox, threshold: float,
                                         add_margin: int = 5):
    """Greedily grow the patch bbox while adjacent rows/cols stay above
    threshold (ref helpers.py:53-87).  Returns end-exclusive bbox."""
    start_h, end_h, start_w, end_w = tuple(int(v) for v in patch_bbox)
    mask = (activation_map >= threshold)
    h, w = activation_map.shape
    stopped = [False] * 4
    while not all(stopped):
        if not stopped[0] and start_h > 0 and \
                mask[start_h - 1, start_w:end_w + 1].any():
            start_h -= 1
        else:
            stopped[0] = True
        if not stopped[1] and end_h < h - 1 and \
                mask[end_h + 1, start_w:end_w + 1].any():
            end_h += 1
        else:
            stopped[1] = True
        if not stopped[2] and start_w > 0 and \
                mask[start_h:end_h + 1, start_w - 1].any():
            start_w -= 1
        else:
            stopped[2] = True
        if not stopped[3] and end_w < w - 1 and \
                mask[start_h:end_h + 1, end_w + 1].any():
            end_w += 1
        else:
            stopped[3] = True
    return (max(start_h - add_margin, 0), min(end_h + add_margin, h - 1) + 1,
            max(start_w - add_margin, 0), min(end_w + add_margin, w - 1) + 1)
