"""Shared part-intersection machinery for the consistency/stability
interpretability metrics (ref `metrics/consistency.py:185-270`,
`metrics/stability.py:183-260`).

For each (image, present class, class prototype): threshold the
prototype's class-masked activation map at a per-map quantile, locate the
connected-component centroids of every part annotation within the class
mask, and record which parts the thresholded activation hits.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import cv2
import numpy as np

from scaleprotoseg_tpu.analysis.common import (activation_from_distance,
                                               quantile_map)


def part_intersect(distances: np.ndarray, cls_ann: np.ndarray,
                   part_ann: np.ndarray, spec, cls2name: Dict[int, str],
                   img_id, quantile: float, max_parts: int,
                   filter_proto_ids: Optional[List[int]] = None,
                   filter_class_ids: List[int] = (),
                   nan_missing_parts: bool = True) -> List[List]:
    """Rows of [part_0..part_MAX, proto_id, class_name, img_id].

    Args:
      distances: (H', W', P) prototype distance maps of the image.
      cls_ann: (H, W) converted class annotation (0 = void).
      part_ann: (H, W) part-id annotation (annotations_PIDS).
      nan_missing_parts: consistency uses NaN for absent parts
        (ref consistency.py:242), stability uses 0 (ref stability.py:241).
    """
    ih, iw = cls_ann.shape
    rows = []
    for class_id in np.unique(cls_ann):
        if class_id == 0 or class_id in filter_class_ids:
            continue
        proto_ids = np.nonzero(spec.class_identity[:, class_id - 1])[0]
        if filter_proto_ids is not None:
            proto_ids = [p for p in proto_ids if p in filter_proto_ids]
        y_mask = (cls_ann == class_id)

        part_centroids = {}
        part_mask = part_ann * y_mask
        for part_id in np.unique(part_mask):
            if part_id <= 0:
                continue
            bin_mask = (part_mask == part_id).astype(np.uint8)
            _, _, _, centroids = cv2.connectedComponentsWithStats(
                bin_mask, 8, cv2.CV_32S)
            part_centroids[int(part_id)] = \
                np.round(centroids).astype(int)
        if not part_centroids:
            continue

        for p in proto_ids:
            missing = np.nan if nan_missing_parts else 0
            presence = [missing] * (max_parts + 1)
            act = activation_from_distance(distances[:, :, p])
            up = cv2.resize(act, dsize=(iw, ih),
                            interpolation=cv2.INTER_NEAREST)
            up = up * y_mask
            binary = quantile_map(up, quantile)
            for part_id, centroids in part_centroids.items():
                if part_id > max_parts:
                    continue
                hits = 0
                for centroid in centroids:
                    x, y = int(centroid[0]), int(centroid[1])
                    if 0 <= y < ih and 0 <= x < iw:
                        hits += int(binary[y, x, 0])
                presence[part_id] = 0 if hits == 0 else 1
            rows.append(presence + [int(p),
                                    cls2name.get(int(class_id) - 1,
                                                 str(class_id - 1)),
                                    img_id])
    return rows
