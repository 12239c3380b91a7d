"""ProtoSeg single-scale baseline trainer.

CLI parity with `python -m segmentation.train_wandb <config> <run_name>
[--pruned]` (ref train_wandb.py): identical phase pipeline to the
multi-scale trainer but with the single-scale model variant
(``PatchClassificationModule`` gin bindings, ``PPNet`` class bindings).
``--pruned`` finetunes the last layer of a pruned model
(``pruned/pruned.ckpt``) as the post-pruning step (README.md:121-126).
"""

from __future__ import annotations

import argparse
import os

from scaleprotoseg_tpu import cli_common
from scaleprotoseg_tpu.train_wandb_multiscale import train as _train


def train(config: str, experiment_name: str, pruned: bool = False,
          data_root=None, num_workers=None, n_devices=None,
          gin_overrides=None, tpu_recipe: bool = False,
          log=None) -> str:
    if pruned:
        return train_pruned(config, experiment_name, data_root=data_root,
                            num_workers=num_workers,
                            gin_overrides=gin_overrides,
                            tpu_recipe=tpu_recipe, log=log)
    return _train(config, experiment_name, data_root=data_root,
                  variant="single", num_workers=num_workers,
                  n_devices=n_devices, gin_overrides=gin_overrides,
                  tpu_recipe=tpu_recipe, log=log)


def train_pruned(config: str, experiment_name: str, data_root=None,
                 num_workers=None, gin_overrides=None,
                 tpu_recipe: bool = False, log=None) -> str:
    """Last-layer finetune of a pruned model (ref train_wandb.py --pruned)."""
    import jax.numpy as jnp

    from scaleprotoseg_tpu import settings
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.train.metrics import MetricsLogger, create_logger
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    config_file = cli_common.load_config(config)
    cli_common.apply_overrides(gin_overrides, tpu_recipe)
    hp = cli_common.train_hparams()
    results_dir = os.path.join(settings.results_dir(), experiment_name)
    pruned_ckpt = os.path.join(results_dir, "pruned", "pruned.ckpt")
    log = log or create_logger(os.path.join(results_dir, "train.log"))
    cli_common.seed_everything(hp["random_seed"])

    model, spec, variables = load_model(results_dir, pruned_ckpt)
    # config was cleared by load_model's re-parse; reload the named config
    cli_common.load_config(config)
    cli_common.apply_overrides(gin_overrides, tpu_recipe)
    variant = "group" if model.grouped else (
        "multiscale" if spec.num_scales > 1 else "single")
    mhp = module_hparams(variant)
    mesh = cli_common.training_mesh()
    trainer = PhaseTrainer(model, spec, variant,
                           os.path.join(results_dir, "pruned"), mhp,
                           logger=MetricsLogger(
                               os.path.join(results_dir, "pruned")),
                           mesh=mesh, log=log)
    tl, vl = cli_common.make_loaders(
        cli_common.data_parallel_batch(hp["joint_batch_size"], mesh,
                                       log=log),
        num_workers=num_workers, seed=hp["random_seed"],
        data_root=data_root)
    res = trainer.run_phase(
        variables, phase=2, max_steps=max(hp["finetune_steps"], 1),
        train_loader=tl, val_loader=vl,
        early_stopping_patience=hp["early_stopping_patience_last_layer"])
    final = os.path.join(results_dir, "pruned", "checkpoints",
                         "push_last.ckpt")
    save_checkpoint(final, res.state.params, res.state.batch_stats,
                    spec=spec)
    log(f"Pruned finetune complete: {final}")
    return final


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("experiment_name")
    p.add_argument("--pruned", action="store_true")
    p.add_argument("--data-root", default=None)
    p.add_argument("--num-workers", type=int, default=None)
    cli_common.add_override_args(p)
    a = p.parse_args()
    train(a.config, a.experiment_name, pruned=a.pruned,
          data_root=a.data_root, num_workers=a.num_workers,
          gin_overrides=a.gin, tpu_recipe=a.tpu_recipe)


if __name__ == "__main__":
    main()
