"""Per-prototype push visualization artifacts.

Parity with the reference's ``update_prototypes_on_image``
(`push_multiscale_optimization.py:342-686`): for every prototype, using
its winning training image — the original image, the high-activation
bbox crop and overlay, the self-activation heatmap (as .npy + png), a
GT-class-masked variant, all filed under per-class directories, plus the
``bb*.npy`` bound-box tables.

TPU redesign: one distances forward per *unique* winner image serves all
of its prototypes (the reference re-encodes per prototype); rendering is
host-side matplotlib, decoupled from the math (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from scaleprotoseg_tpu.helpers import (find_high_activation_crop, makedir)
from scaleprotoseg_tpu.ops.prototype import EPSILON
from scaleprotoseg_tpu.spec import ProtoSpec


def save_push_artifacts(model, variables: Dict, spec: ProtoSpec,
                        push_loader, best_img: np.ndarray,
                        best_flat: np.ndarray, out_dir: str,
                        cls2name: Optional[Dict[int, str]] = None,
                        img_prefix: str = "prototype-img",
                        act_prefix: str = "prototype-self-act",
                        bb_prefix: str = "bb",
                        epoch_number: Optional[int] = None,
                        log=print) -> np.ndarray:
    """Render artifacts for every matched prototype; returns the
    (P, 6) bound-box table [img_idx, h0, h1, w0, w1, class]."""
    import cv2
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    @jax.jit
    def distances_of(variables, images):
        _, d = model.apply(variables, images, method="push_forward")
        return d

    P = spec.num_prototypes
    proto_class = np.argmax(spec.class_identity, axis=1)
    cls2name = cls2name or {}
    bound_boxes = np.full((P, 6), -1, np.int64)
    makedir(out_dir)

    by_winner: Dict[int, list] = {}
    for p in range(P):
        if best_img[p] >= 0:
            by_winner.setdefault(int(best_img[p]), []).append(p)

    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    offset = 0
    n_saved = 0
    for images, targets in push_loader:
        wanted = [w for w in range(offset, offset + images.shape[0])
                  if w in by_winner]
        if wanted:
            d = np.asarray(jax.device_get(
                distances_of(variables, jnp.asarray(images))))
            for w in wanted:
                img = np.asarray(images[w - offset])
                disp = np.clip(img * std + mean, 0, 1)
                target = np.asarray(targets[w - offset])
                ih, iw = disp.shape[:2]
                gh, gw = d.shape[1], d.shape[2]
                for p in by_winner[w]:
                    c = int(proto_class[p])
                    cname = cls2name.get(c, f"class_{c}")
                    cls_dir = os.path.join(out_dir, str(cname))
                    makedir(cls_dir)
                    dist_map = d[w - offset, :, :, p]
                    act = np.log((dist_map + 1) / (dist_map + EPSILON))
                    up = cv2.resize(act, dsize=(iw, ih),
                                    interpolation=cv2.INTER_LINEAR)
                    y0, y1, x0, x1 = find_high_activation_crop(up)
                    bound_boxes[p] = [best_img[p], y0, y1, x0, x1, c]

                    suffix = str(p)
                    np.save(os.path.join(
                        cls_dir, f"{act_prefix}{suffix}.npy"), act)
                    plt.imsave(os.path.join(
                        cls_dir, f"{img_prefix}-original{suffix}.png"),
                        disp)
                    plt.imsave(os.path.join(
                        cls_dir, f"{img_prefix}{suffix}.png"),
                        disp[y0:y1, x0:x1])
                    # heatmap overlay
                    rescaled = (up - up.min()) / max(up.max() - up.min(),
                                                     1e-8)
                    heat = plt.cm.jet(rescaled)[..., :3]
                    overlay = 0.5 * disp + 0.3 * heat
                    plt.imsave(os.path.join(
                        cls_dir,
                        f"{img_prefix}-original_with_self_act"
                        f"{suffix}.png"), np.clip(overlay, 0, 1))
                    # GT-class-masked variant
                    gt_mask = (target == c + 1)[..., None]
                    plt.imsave(os.path.join(
                        cls_dir,
                        f"{img_prefix}-original_gt_mask{suffix}.png"),
                        np.clip(disp * (0.3 + 0.7 * gt_mask), 0, 1))
                    n_saved += 1
        offset += images.shape[0]

    suffix = "" if epoch_number is None else str(epoch_number)
    np.save(os.path.join(out_dir, f"{bb_prefix}{suffix}.npy"),
            bound_boxes)
    np.save(os.path.join(out_dir,
                         f"{bb_prefix}-receptive_field{suffix}.npy"),
            bound_boxes)
    log(f"push artifacts: saved {n_saved} prototype visualizations")
    return bound_boxes
