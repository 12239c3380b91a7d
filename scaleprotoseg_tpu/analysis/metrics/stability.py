"""Stability interpretability metric.

CLI parity with `python -m segmentation.analysis.metrics.stability
<model_name> <training_phase> <data_type> [--quantile] [--std-dev]
[--group-name]` (ref metrics/stability.py:46-180): a prototype's
part-hit pattern is computed on the clean image and on the image with
Gaussian noise added; a row is *stable* when all part hits agree, and
the score is the mean stability over (image, class, prototype) rows.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import pandas as pd

from scaleprotoseg_tpu.analysis.metrics.consistency import \
    _collect_presence
from scaleprotoseg_tpu.train.metrics import create_logger


def run_stability(model_name: str, training_phase: str, data_type: str,
                  quantile: float = 0.8, std_dev: float = 0.2,
                  group_name: Optional[str] = None,
                  results_root: Optional[str] = None,
                  data_root: Optional[str] = None,
                  limit: Optional[int] = None) -> float:
    log = create_logger(None)
    clean, max_parts, model_path = _collect_presence(
        model_name, training_phase, data_type, quantile, group_name,
        results_root, data_root, log, nan_missing_parts=False,
        limit=limit)
    noisy, _, _ = _collect_presence(
        model_name, training_phase, data_type, quantile, group_name,
        results_root, data_root, log, noise_std=std_dev,
        nan_missing_parts=False, limit=limit)
    out_dir = os.path.join(model_path, "metrics", training_phase)
    os.makedirs(out_dir, exist_ok=True)

    part_cols = [f"part_{i}" for i in range(max_parts + 1)]
    stab_cols = [f"part_stab_{i}" for i in range(max_parts + 1)]
    df = pd.DataFrame(clean, columns=part_cols +
                      ["proto_id", "class", "img_id"])
    dfn = pd.DataFrame(noisy, columns=stab_cols +
                       ["proto_id", "class", "img_id"])
    tot = df.merge(dfn, on=["proto_id", "class", "img_id"])
    for i in range(max_parts + 1):
        tot[f"eq_part_{i}"] = (tot[f"part_{i}"] ==
                               tot[f"part_stab_{i}"]).astype(int)
    eq_cols = [f"eq_part_{i}" for i in range(max_parts + 1)]
    tot["is_stable"] = (tot[eq_cols].sum(axis=1) ==
                        max_parts + 1).astype(int)
    tot.to_csv(os.path.join(out_dir,
                            f"tot_presence_stab_qt_{quantile}.csv"),
               index=False)
    score = float(tot.is_stable.mean()) if len(tot) else 0.0
    log(f"Stability score: {score}")
    with open(os.path.join(out_dir,
                           f"stability_score_qt_{quantile}.txt"),
              "w") as f:
        f.write(f"{score}")
    return score


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("training_phase")
    p.add_argument("data_type")
    p.add_argument("--quantile", type=float, default=0.8)
    p.add_argument("--std-dev", type=float, default=0.2)
    p.add_argument("--group-name", default=None)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args()
    run_stability(a.model_name, a.training_phase, a.data_type,
                  quantile=a.quantile, std_dev=a.std_dev,
                  group_name=a.group_name, limit=a.limit)


if __name__ == "__main__":
    main()
