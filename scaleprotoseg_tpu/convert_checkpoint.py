"""Convert reference (torch) checkpoints to framework checkpoints.

CLI for the Zenodo-parity path (BASELINE.json north star: "load the
released Zenodo checkpoints with mIoU parity"):

    # whole-module reference pickle (e.g. Zenodo push_final.pth)
    python -m scaleprotoseg_tpu.convert_checkpoint reference \\
        push_final.pth out/checkpoints/push_final.ckpt

    # torchvision ImageNet ResNet state dict -> backbone-only checkpoint
    python -m scaleprotoseg_tpu.convert_checkpoint torchvision \\
        resnet101.pth backbone.ckpt

    # the way back: framework checkpoint -> reference-named torch
    # state dict (loads into the reference's PPNet classes)
    python -m scaleprotoseg_tpu.convert_checkpoint export-torch \\
        out/checkpoints/push_final.ckpt push_final_sd.pth

The reference variant reconstructs the ProtoSpec from the pickle's
module attributes (scale ranges survive push-time pruning), maps every
tensor onto the framework's param tree, and writes a standard
``.ckpt`` + spec-JSON pair loadable by every CLI here.
"""

from __future__ import annotations

import argparse

import numpy as np


def _install_run_config(dst: str, config: str):
    """Copy the named experiment config into the run dir as config.gin so
    eval/analysis CLIs can rebuild the model (the reference copies the
    config at train time, train_wandb_multiscale.py:187; a converted
    Zenodo run never trained here, so the converter installs it)."""
    import os
    import shutil

    ckpt_dir = os.path.dirname(os.path.abspath(dst))
    run_dir = os.path.dirname(ckpt_dir) \
        if os.path.basename(ckpt_dir) == "checkpoints" else ckpt_dir
    src_cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "configs", f"{config}.gin")
    if not os.path.exists(src_cfg):
        raise FileNotFoundError(f"no such experiment config: {src_cfg}")
    os.makedirs(run_dir, exist_ok=True)
    out = os.path.join(run_dir, "config.gin")
    shutil.copyfile(src_cfg, out)
    print(f"Installed {config}.gin as {out}")


def convert_reference(src: str, dst: str, variant_hint: str = "auto",
                      config: str = None) -> str:
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.checkpoints.torch_convert import (
        load_reference_pickle_with_meta, ppnet_statedict_to_params,
        spec_from_reference_meta)

    sd, meta = load_reference_pickle_with_meta(src)
    spec = spec_from_reference_meta(sd, meta)
    params, batch_stats = ppnet_statedict_to_params(sd, spec)
    variant = variant_hint
    if variant == "auto":
        variant = "group" if "last_layer_group" in params else (
            "multiscale" if spec.num_scales > 1 else "single")
    save_checkpoint(dst, params, batch_stats, spec=spec,
                    extra={"variant": variant, "source": src,
                           "converted_from": "reference_pickle"})
    if config:
        _install_run_config(dst, config)
    print(f"Converted {src} -> {dst} "
          f"({spec.num_prototypes} prototypes, {spec.num_classes} classes,"
          f" {spec.num_scales} scales, variant={variant})")
    return dst


def convert_torchvision(src: str, dst: str) -> str:
    import torch

    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.checkpoints.torch_convert import (
        torchvision_resnet_to_backbone)

    sd = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    params, stats = torchvision_resnet_to_backbone(sd)
    save_checkpoint(dst, {"backbone": params}, {"backbone": stats},
                    extra={"source": src,
                           "converted_from": "torchvision"})
    print(f"Converted {src} -> {dst} (backbone only; use "
          "PRETRAINED_BACKBONE_CKPT to load)")
    return dst


def export_torch(src: str, dst: str) -> str:
    """Framework checkpoint -> reference-named torch state dict (.pth).

    The way back for migrating users: the exported dict loads into the
    reference's PPNet classes via ``load_state_dict`` (the reference's
    own cross-phase bootstrap is a ``strict=False`` state-dict load,
    `segmentation/finetune_wandb_group.py:74-84`), so weights trained
    here can drive the reference's training/analysis stack.
    """
    import torch

    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    from scaleprotoseg_tpu.checkpoints.torch_convert import (
        ppnet_params_to_statedict)

    params, batch_stats, meta = load_checkpoint(src)
    if "spec" not in meta:
        raise ValueError(f"{src} has no ProtoSpec metadata — only full "
                         "model checkpoints export to torch")
    spec = spec_from_meta(meta["spec"])
    sd = ppnet_params_to_statedict(params, batch_stats, spec)
    # torch.tensor copies, so jax's non-writable numpy views are safe
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
               dst)
    print(f"Exported {src} -> {dst} ({len(sd)} tensors, reference "
          "state-dict naming)")
    return dst


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["reference", "torchvision",
                                    "export-torch"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--variant", default="auto",
                   choices=["auto", "single", "multiscale", "group"])
    p.add_argument("--config", default=None,
                   help="experiment config name (e.g. "
                   "group_scaleproto_cityscapes) to install as the run's "
                   "config.gin so eval/analysis can rebuild the model")
    a = p.parse_args()
    if a.kind == "reference":
        convert_reference(a.src, a.dst, a.variant, config=a.config)
    elif a.kind == "export-torch":
        export_torch(a.src, a.dst)
    else:
        convert_torchvision(a.src, a.dst)


if __name__ == "__main__":
    main()
