"""Metric accumulation + CSV/JSONL logging.

Observability equivalent of the reference's Lightning CSV/TensorBoard/W&B
logger stack (SURVEY.md §2.12): every ``log()`` appends one JSONL record
and maintains a wide CSV; metric names match the reference
(``train/val_{loss,cross_entropy,kld_loss,...}``, ``val_accuracy``,
``l1``, ``avg_dist_proto``, ``lr``, ``training_stage``) so downstream
dashboards translate 1:1.
"""

from __future__ import annotations

import csv
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricAccumulator:
    """Running sums matching the reference's per-epoch metric dicts
    (`module_multiscale.py:34-44`)."""

    def __init__(self):
        self.sums = defaultdict(float)
        self.n_batches = 0
        self.n_correct = 0.0
        self.n_patches = 0.0

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            v = float(v)
            if k == "n_correct":
                self.n_correct += v
            elif k == "n_patches":
                self.n_patches += v
            else:
                self.sums[k] += v
        self.n_batches += 1

    def summary(self) -> Dict[str, float]:
        out = {k: v / max(self.n_batches, 1) for k, v in self.sums.items()}
        if self.n_patches > 0:
            out["accuracy"] = self.n_correct / self.n_patches
        return out


class MetricsLogger:
    def __init__(self, model_dir: str, run_name: str = "metrics"):
        os.makedirs(model_dir, exist_ok=True)
        self.jsonl_path = os.path.join(model_dir, f"{run_name}.jsonl")
        self.csv_path = os.path.join(model_dir, f"{run_name}.csv")
        self._csv_fields = None

    def log(self, metrics: Dict[str, float], step: int):
        record = {"step": int(step), "time": time.time(),
                  **{k: float(v) for k, v in metrics.items()}}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        fields = sorted(record)
        if self._csv_fields != fields or not os.path.exists(self.csv_path):
            self._csv_fields = fields
            write_header = True
        else:
            write_header = False
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(record)


def create_logger(log_file: Optional[str] = None):
    """File+stdout line logger (ref log.py:7-20)."""
    fh = open(log_file, "a") if log_file else None

    def log(msg):
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        if fh is not None:
            fh.write(line + "\n")
            fh.flush()

    return log
