"""ScaleProtoSeg prototype-phase trainer.

CLI parity with the reference
(`python -m segmentation.train_wandb_multiscale <config> <run_name>`,
README.md:102-126):

    python -m scaleprotoseg_tpu.train_wandb_multiscale <config> <run_name>

Pipeline (ref train_wandb_multiscale.py:36-320): seed -> construct model
-> optional pretrained-backbone load -> warm-up phase -> joint phase ->
prototype push (+ duplicate pruning) -> last-layer phase with early
stopping -> ``push_final`` checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu import cli_common, configlib
from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                              save_checkpoint,
                                              spec_from_meta)
from scaleprotoseg_tpu.models.factory import construct_PPNet
from scaleprotoseg_tpu.push.push import push_prototypes
from scaleprotoseg_tpu.train.metrics import (MetricsLogger, create_logger,
                                              make_external_sinks)
from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams


def _init_variables(model, window, seed):
    h, w = window
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)


def _maybe_load_pretrained_backbone(variables, log):
    """Load a converted torchvision/COCO backbone if provided via env
    PRETRAINED_BACKBONE (torch .pth) or PRETRAINED_BACKBONE_CKPT (ours)."""
    torch_path = os.environ.get("PRETRAINED_BACKBONE", "")
    ckpt_path = os.environ.get("PRETRAINED_BACKBONE_CKPT", "")
    if ckpt_path:
        params, batch_stats, _ = load_checkpoint(ckpt_path)
        variables["params"]["backbone"] = jax.tree.map(
            jnp.asarray, params["backbone"])
        if batch_stats:
            variables["batch_stats"] = jax.tree.map(
                jnp.asarray, batch_stats)
        log(f"Loaded pretrained backbone from {ckpt_path}")
    elif torch_path:
        from scaleprotoseg_tpu.checkpoints.torch_convert import (
            load_torch_backbone_into)
        variables = load_torch_backbone_into(variables, torch_path, log=log)
    return variables


def train(config: str, experiment_name: str,
          data_root: Optional[str] = None, variant: str = "multiscale",
          num_workers: Optional[int] = None, push_artifacts: bool = True,
          n_devices: Optional[int] = None,
          wandb_experiment: Optional[str] = None,
          gin_overrides=None, tpu_recipe: bool = False, log=None) -> str:
    config_file = cli_common.load_config(config)
    cli_common.apply_overrides(gin_overrides, tpu_recipe)
    hp = cli_common.train_hparams()
    results_dir = cli_common.setup_run_dir(experiment_name, config_file)
    log = log or create_logger(os.path.join(results_dir, "train.log"))
    cli_common.seed_everything(hp["random_seed"])

    # Data-parallel over all visible devices by default; pin with
    # --num-devices / gin ``train.num_devices`` (e.g. 1 to reproduce the
    # reference's single-device batch semantics exactly), or set
    # ``train.num_slices`` on a multi-slice pod (cli_common.training_mesh).
    mesh = cli_common.training_mesh(n_devices)
    warmup_batch = cli_common.data_parallel_batch(
        hp["warmup_batch_size"], mesh, log=log)
    joint_batch = cli_common.data_parallel_batch(
        hp["joint_batch_size"], mesh, log=log)

    model, spec = construct_PPNet(variant=variant)
    window = configlib.query("PatchClassificationDataset", "window_size",
                             (513, 513))
    variables = dict(_init_variables(model, window, hp["random_seed"]))
    variables = _maybe_load_pretrained_backbone(variables, log)

    if hp["start_checkpoint"] and str(hp["start_checkpoint"]) not in ("", "TBD"):
        params, batch_stats, meta = load_checkpoint(hp["start_checkpoint"])
        variables = {"params": params, "batch_stats": batch_stats}
        log(f"Resumed from {hp['start_checkpoint']}")

    mhp = module_hparams(variant)
    logger = MetricsLogger(results_dir, sinks=make_external_sinks(
        results_dir, experiment_name,
        config_name=os.path.splitext(os.path.basename(config_file))[0],
        wandb_experiment=wandb_experiment, log=log))
    logger.log_hyperparams(configlib.operative_config())
    trainer = PhaseTrainer(model, spec, variant, results_dir, mhp,
                           logger=logger, mesh=mesh, log=log)
    val_check = configlib.query("Trainer", "val_check_interval", None)

    global_step = 0
    # ---------------- Phase 0: warm-up ----------------
    if hp["warmup_steps"] > 0:
        tl, vl = cli_common.make_loaders(warmup_batch,
                                         num_workers=num_workers,
                                         seed=hp["random_seed"],
                                         data_root=data_root)
        res = trainer.run_phase(variables, phase=0,
                                max_steps=hp["warmup_steps"],
                                train_loader=tl, val_loader=vl,
                                val_every_steps=val_check,
                                global_step0=global_step)
        variables = {"params": res.state.params,
                     "batch_stats": res.state.batch_stats}
        global_step += res.steps_done

    # ---------------- Phase 1: joint ----------------
    if hp["joint_steps"] > 0:
        tl, vl = cli_common.make_loaders(joint_batch,
                                         num_workers=num_workers,
                                         seed=hp["random_seed"] + 1,
                                         data_root=data_root)
        res = trainer.run_phase(variables, phase=1,
                                max_steps=hp["joint_steps"],
                                train_loader=tl, val_loader=vl,
                                val_every_steps=val_check,
                                global_step0=global_step)
        variables = {"params": res.state.params,
                     "batch_stats": res.state.batch_stats}
        global_step += res.steps_done

    # ---------------- Push ----------------
    if hp.get("push_proto", True):
        log("PUSH: projecting prototypes onto nearest training patches")
        push_loader = cli_common.make_push_loader(
            batch_size=max(1, mesh.devices.size), data_root=data_root)
        data_type = hp.get("data_type") or "cityscapes"
        try:
            from scaleprotoseg_tpu.eval_valid_multiscale import class_names
            cls2name = dict(enumerate(class_names(data_type,
                                                  spec.num_classes)))
        except Exception:
            cls2name = None
        result = push_prototypes(
            model, variables, spec, push_loader,
            prototypes_dir=os.path.join(results_dir, "prototypes"),
            save_artifacts=push_artifacts, cls2name=cls2name,
            mesh=mesh, log=log)
        variables = {"params": result.params,
                     "batch_stats": variables.get("batch_stats")}
        if result.spec is not spec and \
                result.spec.num_prototypes != spec.num_prototypes:
            spec = result.spec
            model = dataclasses.replace(model, spec=spec)
            trainer = PhaseTrainer(model, spec, variant, results_dir, mhp,
                                   logger=logger, mesh=mesh, log=log)
        save_checkpoint(os.path.join(results_dir,
                                     "checkpoints", "push_last.ckpt"),
                        variables["params"], variables.get("batch_stats"),
                        spec=spec)

    # ---------------- Phase 2: last layer ----------------
    if hp["finetune_steps"] > 0:
        tl, vl = cli_common.make_loaders(joint_batch,
                                         num_workers=num_workers,
                                         seed=hp["random_seed"] + 2,
                                         data_root=data_root)
        res = trainer.run_phase(
            variables, phase=2, max_steps=hp["finetune_steps"],
            train_loader=tl, val_loader=vl,
            early_stopping_patience=hp[
                "early_stopping_patience_last_layer"],
            val_every_steps=val_check, global_step0=global_step)
        variables = {"params": res.state.params,
                     "batch_stats": res.state.batch_stats}

    final = os.path.join(results_dir, "checkpoints", "push_final.ckpt")
    save_checkpoint(final, variables["params"],
                    variables.get("batch_stats"), spec=spec)
    log(f"Training complete; final checkpoint: {final}")
    return final


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("experiment_name")
    p.add_argument("--data-root", default=None)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--wandb-experiment", default=None,
                   help="resume the W&B run with this name "
                        "(ref train_wandb_multiscale.py:167-175)")
    cli_common.add_override_args(p)
    a = p.parse_args()
    train(a.config, a.experiment_name,
          data_root=a.data_root, num_workers=a.num_workers,
          n_devices=a.num_devices, wandb_experiment=a.wandb_experiment,
          gin_overrides=a.gin, tpu_recipe=a.tpu_recipe)


if __name__ == "__main__":
    main()
