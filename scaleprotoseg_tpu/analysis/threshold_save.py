"""Zero out low-weight group-projection entries and save.

CLI parity with `python -m segmentation.analysis.threshold_save
<model_name> <training_phase> <threshold>` (ref threshold_save.py:11-35):
ScaleProtoSeg's pruning analog — group weights below the threshold are
set to 0 (rows are NOT re-normalized, matching the reference) and the
model is saved as ``th-{threshold}-{phase}_last.ckpt`` next to the source
checkpoint (the name consumed by the consistency/stability metrics).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                              save_checkpoint,
                                              spec_from_meta)
from scaleprotoseg_tpu.model_loading import resolve_checkpoint
from scaleprotoseg_tpu.train.metrics import create_logger


def threshold_save(model_name: str, training_phase: str, threshold: float,
                   results_root: Optional[str] = None) -> str:
    threshold = float(threshold)
    model_path = os.path.join(results_root or settings.results_dir(),
                              model_name)
    checkpoint_path = resolve_checkpoint(model_path, training_phase)
    log = create_logger(None)
    log(f"Loading model from {checkpoint_path}")
    params, batch_stats, meta = load_checkpoint(checkpoint_path)
    if "group_projection" not in params:
        raise ValueError("threshold_save requires a grouped model "
                         "checkpoint (no group_projection found)")
    gw = np.asarray(params["group_projection"]).copy()
    gw[gw < threshold] = 0.0
    params = dict(params)
    params["group_projection"] = gw

    out = os.path.join(os.path.dirname(checkpoint_path),
                       f"th-{threshold}-{training_phase}_last.ckpt")
    spec = spec_from_meta(meta["spec"]) if "spec" in meta else None
    save_checkpoint(out, params, batch_stats, spec=spec,
                    extra=(meta.get("extra") or {}))
    log(f"Saved thresholded model to {out}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("threshold", type=float)
    a = p.parse_args()
    threshold_save(a.model_name, a.training_phase, a.threshold)


if __name__ == "__main__":
    main()
