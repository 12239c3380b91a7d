"""Equivariance-JSON group-projection initialization.

Parity with `model_multiscale_group.py:522-586` (``initialize_group_
projection`` — marked "Deprecated for COCO | NOT USED" upstream): a JSON
maps each class to a list of groups, each group being a per-scale list of
LOCAL prototype indices (local to that class within that scale).  For
group row k of class c:

- every listed prototype (offset into the class's column space by the
  cumulative per-scale class counts) gets weight ``weight / len(p_ids)``
  of its scale's list,
- the remaining entries are rescaled by
  ``(1 - tot_scale * weight) / (1 - tot_org_weight)`` so the row stays on
  the probability simplex.

The upstream branch that EXPANDS a class beyond ``num_groups`` groups
(``len(group_equiv[cls]) > 3`` — resizing ``last_layer_group`` and
``group_class_identity`` in place) is intentionally NOT reproduced: it is
dead code upstream and conflicts with the fixed-G dense (C, G, Pc_max)
layout; see COMPONENTS.md for the waiver.
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

from scaleprotoseg_tpu.spec import ProtoSpec


def equivariance_group_weights(group_projection: np.ndarray,
                               spec: ProtoSpec,
                               group_equiv: Dict[int, List],
                               weight: float) -> np.ndarray:
    """Returns a re-initialized copy of the (C, G, Pc_max) group weights."""
    w = np.array(group_projection, np.float32)
    num_groups = w.shape[1]
    for cls_i, groups in group_equiv.items():
        cls_i = int(cls_i)
        if len(groups) > num_groups:
            raise NotImplementedError(
                f"class {cls_i} specifies {len(groups)} equivariance "
                f"groups > num_groups={num_groups}; the reference's "
                "group-count expansion branch is waived (dead code "
                "upstream, see models/group_init.py)")
        # cumulative class-c prototype count per scale -> local col offset
        # (ref :538-548)
        counts = spec.class_scale_counts[cls_i]          # (S,)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        n_cols = int(spec.class_counts[cls_i])
        for k, group in enumerate(groups):
            tot_scale = sum(1 for p_ids in group if len(p_ids) > 0)
            tot_org_weight = 0.0
            all_cols = []
            for scale, p_ids in enumerate(group):
                if not p_ids:
                    continue
                cols = [int(p) + int(offsets[scale]) for p in p_ids]
                all_cols.extend(cols)
                scale_weight = weight / len(p_ids)
                for col in cols:
                    tot_org_weight += float(w[cls_i, k, col])
                    w[cls_i, k, col] = scale_weight
            max_prob = (1.0 - tot_scale * weight) / (1.0 - tot_org_weight)
            mask = np.ones(w.shape[-1], bool)
            mask[all_cols] = False
            mask[n_cols:] = False                        # padded slots stay 0
            w[cls_i, k, mask] *= max_prob
    return w


def apply_equivariance_init(params: Dict, spec: ProtoSpec,
                            group_equiv_path: str, weight: float = 0.25,
                            log=print) -> Dict:
    """Load the JSON and re-initialize ``params['group_projection']``
    (ref :529-536: keys are stringified class ids)."""
    log(f"Running Equivariance Initialization with weight {weight}")
    with open(group_equiv_path) as f:
        group_equiv = {int(k): v for k, v in json.load(f).items()}
    out = dict(params)
    out["group_projection"] = equivariance_group_weights(
        np.asarray(params["group_projection"]), spec, group_equiv, weight)
    return out
