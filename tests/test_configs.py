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
