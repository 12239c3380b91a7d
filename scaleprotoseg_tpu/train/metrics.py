"""Metric accumulation + CSV/JSONL logging, with optional external sinks.

Observability equivalent of the reference's Lightning CSV/TensorBoard/W&B
logger stack (SURVEY.md §2.12): every ``log()`` appends one JSONL record
and maintains a wide CSV; metric names match the reference
(``train/val_{loss,cross_entropy,kld_loss,...}``, ``val_accuracy``,
``l1``, ``avg_dist_proto``, ``lr``, ``training_stage``) so downstream
dashboards translate 1:1.

External sinks mirror `train_wandb_multiscale.py:150-186`: TensorBoard
always when importable (``torch.utils.tensorboard``), W&B gated on the
``USE_WANDB`` env var with project/entity from ``WANDB_PROJECT`` /
``WANDB_USER`` and resume-by-run-name semantics (passing
``wandb_experiment`` re-attaches to the run of that name).
"""

from __future__ import annotations

import csv
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


class MetricAccumulator:
    """Running sums matching the reference's per-epoch metric dicts
    (`module_multiscale.py:34-44`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        """Clear in place (callers may hold bound references to
        ``update`` — e.g. through a BulkFetcher — so rebinding a fresh
        accumulator would silently orphan them)."""
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


class WandbSink:
    """Weights & Biases sink (ref train_wandb_multiscale.py:164-186).

    ``wandb_experiment`` resumes the existing run with that name (the
    reference re-inits by name and reuses the returned run id); otherwise
    a new run named ``experiment_name`` is created with the reference's
    tags ``[config_name, 'segmentation', 'protopnet']``.
    """

    def __init__(self, experiment_name: str, config_name: str = "",
                 wandb_experiment: Optional[str] = None):
        import wandb  # deferred: optional dependency
        self._wandb = wandb
        if wandb_experiment is not None:
            self.run = wandb.init(
                project=os.environ["WANDB_PROJECT"],
                entity=os.environ["WANDB_USER"],
                name=wandb_experiment, resume="allow")
        else:
            self.run = wandb.init(
                project=os.environ["WANDB_PROJECT"],
                entity=os.environ["WANDB_USER"],
                tags=[config_name, "segmentation", "protopnet"],
                name=experiment_name)

    def log(self, record: Dict[str, float], step: int):
        self._wandb.log(record, step=step)

    def log_hyperparams(self, params: Dict):
        self.run.config.update(params, allow_val_change=True)

    def finish(self):
        self._wandb.finish()


class TensorBoardSink:
    """TensorBoard sink via torch.utils.tensorboard (always-on in the
    reference; here enabled whenever the writer is importable)."""

    def __init__(self, model_dir: str):
        from torch.utils.tensorboard import SummaryWriter
        self.writer = SummaryWriter(os.path.join(model_dir, "logs", "tb"))

    def log(self, record: Dict[str, float], step: int):
        for k, v in record.items():
            self.writer.add_scalar(k, v, global_step=step)
        self.writer.flush()

    def log_hyperparams(self, params: Dict):
        self.writer.add_text("hparams", json.dumps(params, default=str))

    def finish(self):
        self.writer.close()


def make_external_sinks(model_dir: str, experiment_name: str,
                        config_name: str = "",
                        wandb_experiment: Optional[str] = None,
                        log=print) -> List:
    """TB (best-effort) + W&B (``USE_WANDB`` env gate, ref settings.py)."""
    sinks: List = []
    try:
        sinks.append(TensorBoardSink(model_dir))
    except Exception as e:
        log(f"TensorBoard logging disabled ({e})")
    if bool(int(os.environ.get("USE_WANDB", "0") or "0")):
        try:
            sinks.append(WandbSink(experiment_name, config_name,
                                   wandb_experiment=wandb_experiment))
        except Exception as e:
            log(f"W&B logging disabled ({e})")
    return sinks


class MetricsLogger:
    def __init__(self, model_dir: str, run_name: str = "metrics",
                 sinks: Optional[List] = None):
        os.makedirs(model_dir, exist_ok=True)
        self.jsonl_path = os.path.join(model_dir, f"{run_name}.jsonl")
        self.csv_path = os.path.join(model_dir, f"{run_name}.csv")
        self._csv_fields = None
        self.sinks = list(sinks or [])

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
        for sink in self.sinks:
            sink.log({k: v for k, v in record.items() if k != "time"},
                     step=int(step))

    def log_hyperparams(self, params: Dict):
        """Operative-config capture (ref config.py:19-28 + logger
        log_hyperparams calls)."""
        for sink in self.sinks:
            sink.log_hyperparams(params)

    def finish(self):
        for sink in self.sinks:
            try:
                sink.finish()
            except Exception:
                pass


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
