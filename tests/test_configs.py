"""Every shipped config parses and constructs the right model shapes."""

import glob
import os

import pytest

from scaleprotoseg_tpu import configlib
from scaleprotoseg_tpu.models.factory import (construct_PPNet,
                                              construct_PPNet_Group)

CONFIGS = os.path.join(os.path.dirname(__file__), "..",
                       "scaleprotoseg_tpu", "configs")

EXPECTED = {
    "scaleproto_cityscapes": (228, 19, 4),
    "scaleproto_pascal": (252, 21, 4),
    "scaleproto_ade": (1800, 150, 4),
    "scaleproto_em": (24, 2, 4),
    "group_scaleproto_cityscapes": (228, 19, 4),
    "group_scaleproto_pascal": (252, 21, 4),
    "group_scaleproto_coco": (2054, 182, 4),
    "baseline_cityscapes": (190, 19, 1),
    "baseline_em": (20, 2, 1),
}


@pytest.fixture(autouse=True)
def clean():
    configlib.clear_config()
    yield
    configlib.clear_config()


def test_all_configs_parse():
    files = glob.glob(os.path.join(CONFIGS, "*.gin"))
    assert len(files) == 15
    for f in files:
        configlib.clear_config()
        configlib.parse_config_file(f)
        assert configlib.all_bindings()


@pytest.mark.parametrize("name,expected", sorted(EXPECTED.items()))
def test_config_builds_model(name, expected):
    configlib.parse_config_file(os.path.join(CONFIGS, name + ".gin"))
    n_protos, n_classes, n_scales = expected
    if name.startswith("group_"):
        model, spec = construct_PPNet_Group()
        assert model.grouped and spec.num_groups == 3
    elif name.startswith("baseline_"):
        model, spec = construct_PPNet(variant="single")
        assert not model.grouped
    else:
        model, spec = construct_PPNet(variant="multiscale")
        assert not model.grouped
    assert spec.num_prototypes == n_protos
    assert spec.num_classes == n_classes
    assert spec.num_scales == n_scales
    # MSC pyramid only for pascal/coco (ref configs: scales [0.5, 0.75])
    if "pascal" in name or "coco" in name:
        assert model.msc_scales == (0.5, 0.75)
    else:
        assert model.msc_scales == ()


def test_runner_gates_fast_aspp_off_for_unet(tmp_path):
    """--tpu-recipe sets train.fast_aspp globally, but the runner must
    keep it OFF for UNet-ASPP backbones: the fused kernel's tap-packed
    VJP runs at FULL input resolution there and measures +8 ms/step at
    the EM shapes (r5, benchmarks/README.md)."""
    import jax.numpy as jnp

    from scaleprotoseg_tpu import cli_common
    from scaleprotoseg_tpu.train.runner import PhaseTrainer, module_hparams

    cli_common.load_config("scaleproto_em")
    cli_common.apply_overrides(None, tpu_recipe=True)
    model, spec = construct_PPNet(variant="multiscale", pretrained=False)
    mhp = module_hparams("multiscale")
    tr = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                      mhp, log=lambda *a, **k: None)
    assert tr.model.backbone.dtype == jnp.bfloat16  # recipe applied
    assert tr.model.backbone.fast_aspp is False     # but gated for UNet


def test_train_package_entry_shim():
    """python -m scaleprotoseg_tpu.train must expose the train_wandb CLI
    (reference's `python -m segmentation.train` surface)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "scaleprotoseg_tpu.train", "--help"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-500:]
    assert "--pruned" in out.stdout


ALL_CONFIGS = sorted(
    os.path.basename(f)[:-4]
    for f in glob.glob(os.path.join(CONFIGS, "*.gin")))

# Fast-profile representatives: one per variant family + the two shape
# regimes that have actually broken (irregular leftover bank; UNet full-
# res head).  The other 11 configs run the same trace under -m slow —
# each costs ~15-20 s of pure Python tracing on this 1-core host.
_FAST_TRACE = {"baseline_cityscapes", "scaleproto_cityscapes",
               "group_scaleproto_coco", "scaleproto_em"}


@pytest.mark.parametrize(
    "name", [n if n in _FAST_TRACE
             else pytest.param(n, marks=pytest.mark.slow)
             for n in ALL_CONFIGS])
def test_config_joint_train_step_traces(name):
    """Abstractly trace every shipped config's REAL joint train step
    (forward + every enabled loss + grads + optimizer) at the config's
    own window/batch/head widths via jax.eval_shape — zero compute, so
    ResNet-101-depth configs stay cheap on CPU.  This is the gate that
    would have caught the group_scaleproto_coco 2052-vs-2054 einsum
    crash (leftover-bank widths only appear at the real config shapes).
    """
    import jax
    import jax.numpy as jnp

    from scaleprotoseg_tpu.models.factory import construct_ppnet
    from scaleprotoseg_tpu.train.optim import (label_params,
                                               make_phase_optimizer,
                                               partition_params,
                                               phase_groups,
                                               poly_schedule)
    from scaleprotoseg_tpu.train.runner import module_hparams
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import make_train_step

    configlib.parse_config_file(os.path.join(CONFIGS, name + ".gin"))
    # variant sniffing mirrors benchmarks/bench_configs.py: a "baseline"
    # name does not imply single-scale (the reference's baseline_coco is
    # the multiscale model; scaleproto_coco is the single-scale one)
    if configlib.query("construct_PPNet_Group", "prototype_shape", None):
        variant = "group"
        model, spec = construct_PPNet_Group(pretrained=False)
    elif configlib.query("PPNetMultiScale", "num_scales", None):
        variant = "multiscale"
        model, spec = construct_PPNet(variant="multiscale",
                                      pretrained=False)
    else:
        variant = "single"
        model, spec = construct_PPNet(variant="single", pretrained=False)
    mhp = module_hparams(variant)
    window = configlib.query("PatchClassificationDataset", "window_size",
                             (513, 513))
    h, w = int(window[0]), int(window[1])
    batch = 2  # shape bugs are batch-independent; keep the trace small

    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=True),
        jax.random.PRNGKey(0))
    groups = phase_groups(variant, 1, mhp["hp"],
                          joint_last=mhp["joint_last"],
                          joint_no_proto=mhp["joint_no_proto"],
                          has_scale_head=model.scale_head_type is not None)
    trainable_s, _ = partition_params(shapes["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable_s),
                              schedule=poly_schedule(
                                  mhp["poly_lr_power"], 1000),
                              iter_size=mhp.get("iter_size", 1))
    step = make_train_step(model, spec, tx, set(groups), mhp["weights"],
                           ignore_void=mhp["ignore_void_class"],
                           project_group_simplex=(variant == "group"),
                           grad_mask_last_group=(variant == "group"),
                           donate=False)

    def run(params_and_stats):
        state = TrainState.create(params_and_stats["params"],
                                  params_and_stats.get("batch_stats"),
                                  tx.init(trainable_s))
        img = jnp.zeros((batch, h, w, 3), jnp.float32)
        tgt = jnp.zeros((batch, h, w), jnp.int32)
        _, metrics = step(state, img, tgt)
        return metrics["loss"]

    out = jax.eval_shape(run, shapes)
    assert out.shape == () and out.dtype == jnp.float32

    # the other two per-config device programs: eval step and push scan
    from scaleprotoseg_tpu.push.push import _make_min_step
    from scaleprotoseg_tpu.train.steps import make_eval_step

    def run_eval_and_push(params_and_stats):
        state = TrainState.create(params_and_stats["params"],
                                  params_and_stats.get("batch_stats"),
                                  tx.init(trainable_s))
        img = jnp.zeros((batch, h, w, 3), jnp.float32)
        tgt = jnp.zeros((batch, h, w), jnp.int32)
        ev = make_eval_step(model, spec, mhp["weights"],
                            ignore_void=mhp["ignore_void_class"])
        metrics = ev(state, img, tgt)
        variables = {"params": params_and_stats["params"]}
        if params_and_stats.get("batch_stats"):
            variables["batch_stats"] = params_and_stats["batch_stats"]
        vals, row, flat_idx = _make_min_step(model, spec)(variables, img,
                                                          tgt)
        return metrics["loss"], vals

    loss_s, vals_s = jax.eval_shape(run_eval_and_push, shapes)
    assert loss_s.shape == ()
    assert vals_s.shape == (spec.num_prototypes,)


def test_cli_gin_overrides_and_tpu_recipe():
    """--gin bindings land on top of the config file and --tpu-recipe
    applies the validated speed knobs (`cli_common.apply_overrides`)."""
    from scaleprotoseg_tpu import cli_common

    configlib.parse_config_file(
        os.path.join(CONFIGS, "scaleproto_cityscapes.gin"))
    assert configlib.query("train", "fast_aspp", False) is False

    applied = cli_common.apply_overrides(
        ["train.num_devices = 3"], tpu_recipe=True)
    assert len(applied) == len(cli_common.TPU_RECIPE_BINDINGS) + 1
    assert configlib.query("train", "compute_dtype") == "bfloat16"
    assert configlib.query("train", "fast_aspp") is True
    assert configlib.query("train", "fast_gradconv") is True
    assert configlib.query("train", "num_devices") == 3

    # later --gin wins over the recipe (user escape hatch)
    cli_common.apply_overrides(["train.fast_gradconv = False"])
    assert configlib.query("train", "fast_gradconv") is False

    # the shared argparse surface round-trips
    import argparse
    p = argparse.ArgumentParser()
    cli_common.add_override_args(p)
    a = p.parse_args(["--tpu-recipe", "--gin", "train.num_devices = 1"])
    assert a.tpu_recipe and a.gin == ["train.num_devices = 1"]
