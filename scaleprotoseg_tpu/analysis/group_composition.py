"""Group composition: which prototypes each group uses.

CLI parity with `python -m segmentation.analysis.group_composition`
(ref analysis/group_composition.py, ``group_comp:20``): for each class
and group, list the prototypes with nonzero (or above-threshold) weight,
write a JSON breakdown, and copy each member prototype's pushed image
into a per-group folder when push artifacts exist.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Optional

import numpy as np

from scaleprotoseg_tpu.analysis.common import load_eval_model
from scaleprotoseg_tpu.train.metrics import create_logger


def group_comp(model_name: str, training_phase: str,
               weight_threshold: float = 0.0,
               results_root: Optional[str] = None):
    log = create_logger(None)
    model, spec, variables, model_path = load_eval_model(
        model_name, training_phase, results_root)
    if not model.grouped:
        raise ValueError("group_composition requires a grouped model")
    gw = np.asarray(variables["params"]["group_projection"])  # (C, G, Pc)

    out_dir = os.path.join(model_path, "analysis", "group_composition",
                           training_phase)
    os.makedirs(out_dir, exist_ok=True)
    proto_img_dir = os.path.join(model_path, "prototypes")

    composition = {}
    for c in range(spec.num_classes):
        class_protos = np.nonzero(spec.class_identity[:, c])[0]
        for k in range(spec.num_groups):
            members = []
            for j, p in enumerate(class_protos):
                w = float(gw[c, k, j])
                if w > weight_threshold:
                    members.append({"proto_id": int(p), "weight": w,
                                    "scale": int(spec.scale_ids[p])})
            members.sort(key=lambda m: -m["weight"])
            composition[f"class_{c}_group_{k}"] = members
            # copy pushed prototype images when available
            grp_dir = os.path.join(out_dir, f"class_{c}", f"group_{k}")
            for m in members:
                for suffix in ("_original.png", "_patch.png",
                               "_bbox.png"):
                    src = os.path.join(proto_img_dir, str(m["proto_id"]),
                                       "nearest-1" + suffix)
                    if os.path.exists(src):
                        os.makedirs(grp_dir, exist_ok=True)
                        shutil.copy(src, os.path.join(
                            grp_dir, f"proto_{m['proto_id']}{suffix}"))
    with open(os.path.join(out_dir, "composition.json"), "w") as f:
        json.dump(composition, f, indent=2)
    log(f"group_composition: wrote {out_dir}")
    return composition


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("--weight-threshold", type=float, default=0.0)
    a = p.parse_args()
    group_comp(a.model_name, a.training_phase,
               weight_threshold=a.weight_threshold)


if __name__ == "__main__":
    main()
