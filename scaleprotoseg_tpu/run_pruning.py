"""Pruning driver.

CLI parity with `python -m segmentation.run_pruning <config> <run_name>`
(ref run_pruning.py:16-83): load the run's ``push_last`` checkpoint,
find each prototype's 6 nearest train patches, prune the impure ones
(threshold 3), and save ``pruned/pruned.ckpt``.  Follow with
`train_wandb --pruned` to re-finetune the last layer (README.md:121-126).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from scaleprotoseg_tpu import cli_common, settings
from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
from scaleprotoseg_tpu.model_loading import load_model
from scaleprotoseg_tpu.prune import prune_prototypes
from scaleprotoseg_tpu.train.metrics import create_logger


def run_pruning(config: str, experiment_name: str, k: int = 6,
                prune_threshold: int = 3, push_batch_size: int = 2,
                data_root: Optional[str] = None,
                results_root: Optional[str] = None,
                full_save: bool = False) -> str:
    config_file = cli_common.load_config(config)
    model_dir = os.path.join(results_root or settings.results_dir(),
                             experiment_name)
    log = create_logger(os.path.join(model_dir, "pruning.log"))
    # proto-phase runs save push_last; grouped runs use the group naming
    # (ref module_multiscale_group_train.py:384-397, finetune :244)
    candidates = ["push_last.ckpt", "final-group.ckpt",
                  "push-group_last.ckpt", "nopush-group_last.ckpt"]
    ckpt = next(
        (p for p in (os.path.join(model_dir, "checkpoints", c)
                     for c in candidates) if os.path.exists(p)),
        os.path.join(model_dir, "checkpoints", candidates[0]))
    model, spec, variables = load_model(model_dir, ckpt)
    cli_common.load_config(config)  # reload (load_model reparses run config)

    mesh = cli_common.training_mesh()
    if mesh.devices.size > 1 and push_batch_size % mesh.devices.size:
        push_batch_size = push_batch_size * mesh.devices.size
        log(f"data-parallel x{mesh.devices.size}: push batch "
            f"-> {push_batch_size}")
    push_loader = cli_common.make_push_loader(batch_size=push_batch_size,
                                              data_root=data_root)
    new_params, new_spec, keep = prune_prototypes(
        push_loader, model, variables, spec, k=k,
        prune_threshold=prune_threshold, original_model_dir=model_dir,
        full_save=full_save, mesh=mesh, log=log)

    out = os.path.join(model_dir, "pruned", "pruned.ckpt")
    save_checkpoint(out, new_params, variables.get("batch_stats"),
                    spec=new_spec,
                    extra={"variant": "group" if model.grouped else
                           ("multiscale" if spec.num_scales > 1
                            else "single"),
                           "kept": [int(i) for i in keep]})
    # eval/analysis resolve "pruned" phase at pruned/checkpoints/push_last
    alias = os.path.join(model_dir, "pruned", "checkpoints",
                         "push_last.ckpt")
    save_checkpoint(alias, new_params, variables.get("batch_stats"),
                    spec=new_spec)
    log(f"Pruned model saved to {out} "
        f"({spec.num_prototypes} -> {new_spec.num_prototypes} prototypes)")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("experiment_name")
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--prune-threshold", type=int, default=3)
    p.add_argument("--push-batch-size", type=int, default=2)
    p.add_argument("--data-root", default=None)
    p.add_argument("--full-save", action="store_true")
    a = p.parse_args()
    run_pruning(a.config, a.experiment_name, k=a.k,
                prune_threshold=a.prune_threshold,
                push_batch_size=a.push_batch_size, data_root=a.data_root,
                full_save=a.full_save)


if __name__ == "__main__":
    main()
