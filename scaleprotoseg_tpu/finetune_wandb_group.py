"""ScaleProtoSeg grouping-phase trainer.

CLI parity with `python -m segmentation.finetune_wandb_group <config>
<run_name>` (ref finetune_wandb_group.py:33-259): load the
prototype-phase checkpoint, bootstrap a grouped model from it
(strict=False semantics — backbone/add-on/prototypes copied, group
projections freshly initialized on the simplex), then group warm-up ->
joint (``joint_last``: group projections + group last layer only) ->
optional last-layer finetune; saves ``final-group``.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu import cli_common, configlib
from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                              save_checkpoint,
                                              spec_from_meta)
from scaleprotoseg_tpu.models.factory import construct_ppnet
from scaleprotoseg_tpu.train.metrics import (MetricsLogger, create_logger,
                                              make_external_sinks)
from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams


def _bootstrap_from_proto_checkpoint(model, variables, ckpt_path, log):
    """strict=False load: copy every matching subtree except the fresh
    group heads (ref finetune_wandb_group.py:74-84)."""
    params, batch_stats, meta = load_checkpoint(ckpt_path)
    new_params = dict(variables["params"])
    copied = []
    for key in ("backbone", "add_on_layers", "prototype_vectors",
                "scale_head"):
        if key in params and key in new_params:
            new_params[key] = jax.tree.map(jnp.asarray, params[key])
            copied.append(key)
        elif key in params:
            new_params[key] = jax.tree.map(jnp.asarray, params[key])
            copied.append(key)
    out = {"params": new_params}
    if batch_stats:
        out["batch_stats"] = jax.tree.map(jnp.asarray, batch_stats)
    elif "batch_stats" in variables:
        out["batch_stats"] = variables["batch_stats"]
    log(f"Bootstrapped {copied} from {ckpt_path}")
    return out, meta


def train(config: str, experiment_name: str,
          start_checkpoint: Optional[str] = None,
          data_root: Optional[str] = None,
          num_workers: Optional[int] = None,
          n_devices: Optional[int] = None,
          wandb_experiment: Optional[str] = None,
          gin_overrides=None, tpu_recipe: bool = False, log=None) -> str:
    config_file = cli_common.load_config(config)
    cli_common.apply_overrides(gin_overrides, tpu_recipe)
    hp = cli_common.train_hparams()
    results_dir = cli_common.setup_run_dir(experiment_name, config_file)
    log = log or create_logger(os.path.join(results_dir, "train.log"))
    cli_common.seed_everything(hp["random_seed"])

    mesh = cli_common.training_mesh(n_devices)
    warmup_batch = cli_common.data_parallel_batch(
        hp["warmup_batch_size"], mesh, log=log)
    joint_batch = cli_common.data_parallel_batch(
        hp["joint_batch_size"], mesh, log=log)

    ckpt = start_checkpoint or hp["start_checkpoint"]
    if not ckpt or str(ckpt) in ("", "TBD"):
        raise ValueError(
            "group finetuning requires train.start_checkpoint "
            "(a prototype-phase checkpoint) or --start-checkpoint")

    # Spec may have been pruned during push: construct from checkpoint meta.
    _, _, meta = load_checkpoint(ckpt)
    spec_override = spec_from_meta(meta["spec"]) if "spec" in meta else None

    model, spec = construct_ppnet(
        variant="group",
        base_architecture=configlib.query("construct_PPNet_Group",
                                          "base_architecture"),
        pretrained=False,
        prototype_shape=tuple(configlib.query("construct_PPNet_Group",
                                              "prototype_shape")),
        num_classes=configlib.query("construct_PPNet_Group", "num_classes"),
        prototype_activation_function=configlib.query(
            "construct_PPNet_Group", "prototype_activation_function",
            "log"),
        add_on_layers_type=configlib.query("construct_PPNet_Group",
                                           "add_on_layers_type",
                                           "deeplab_simple"),
        scale_head_type=configlib.query("construct_PPNet_Group",
                                        "scale_head_type", None))
    if spec_override is not None and \
            spec_override.num_prototypes != spec.num_prototypes:
        import dataclasses as _dc
        spec = _dc.replace(spec_override, num_groups=spec.num_groups)
        model = _dc.replace(model, spec=spec)
        log(f"Using pruned spec from checkpoint: "
            f"{spec.num_prototypes} prototypes")

    window = configlib.query("PatchClassificationDataset", "window_size",
                             (513, 513))
    h, w = window
    variables = dict(model.init(jax.random.PRNGKey(hp["random_seed"]),
                                jnp.zeros((1, h, w, 3))))
    variables, _ = _bootstrap_from_proto_checkpoint(model, variables, ckpt,
                                                    log)

    # Optional equivariance-JSON group init
    # (ref model_multiscale_group.py:514,522-586 — declared NOT USED there)
    equiv_path = configlib.query("construct_PPNet_Group",
                                 "group_equiv_path", None)
    if equiv_path:
        from scaleprotoseg_tpu.models.group_init import \
            apply_equivariance_init
        variables["params"] = jax.tree.map(
            jnp.asarray,
            apply_equivariance_init(
                dict(variables["params"]), spec, equiv_path,
                weight=configlib.query("construct_PPNet_Group",
                                       "equiv_scale_weight", 0.25),
                log=log))

    mhp = module_hparams("group")
    logger = MetricsLogger(results_dir, sinks=make_external_sinks(
        results_dir, experiment_name,
        config_name=os.path.splitext(os.path.basename(config_file))[0],
        wandb_experiment=wandb_experiment, log=log))
    logger.log_hyperparams(configlib.operative_config())
    trainer = PhaseTrainer(model, spec, "group", results_dir, mhp,
                           logger=logger, mesh=mesh, log=log)
    val_check = configlib.query("Trainer", "val_check_interval", None)

    global_step = 0
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

    final = os.path.join(results_dir, "checkpoints", "final-group.ckpt")
    save_checkpoint(final, variables["params"],
                    variables.get("batch_stats"), spec=spec)
    log(f"Group training complete; final checkpoint: {final}")
    return final


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("experiment_name")
    p.add_argument("--start-checkpoint", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--wandb-experiment", default=None)
    cli_common.add_override_args(p)
    a = p.parse_args()
    train(a.config, a.experiment_name, start_checkpoint=a.start_checkpoint,
          data_root=a.data_root, num_workers=a.num_workers,
          n_devices=a.num_devices, wandb_experiment=a.wandb_experiment,
          gin_overrides=a.gin, tpu_recipe=a.tpu_recipe)


if __name__ == "__main__":
    main()
