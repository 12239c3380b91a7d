"""End-to-end group-phase smoke: prototype checkpoint -> group bootstrap
-> warm/joint/last phases -> final-group checkpoint with invariants."""

import os

import numpy as np
import pytest

from e2e_utils import (TINY_EM_CONFIG, TINY_GROUP_CONFIG,
                       build_synthetic_dataset)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    return build_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_em_g")))


def test_group_finetune_pipeline(dataset_root, tmp_path, monkeypatch):
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "results"))
    from scaleprotoseg_tpu.train_wandb_multiscale import train as train_proto
    from scaleprotoseg_tpu.finetune_wandb_group import train as train_group

    proto_cfg = tmp_path / "tiny_em.gin"
    proto_cfg.write_text(TINY_EM_CONFIG.replace(
        "train.joint_steps = 6", "train.joint_steps = 3").replace(
        "train.finetune_steps = 4", "train.finetune_steps = 0"))
    proto_ckpt = train_proto(str(proto_cfg), "proto_run",
                             data_root=dataset_root, num_workers=2)

    group_cfg = tmp_path / "tiny_group.gin"
    group_cfg.write_text(TINY_GROUP_CONFIG)
    final = train_group(str(group_cfg), "group_run",
                        start_checkpoint=proto_ckpt,
                        data_root=dataset_root, num_workers=2)
    assert os.path.exists(final)

    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    params, _, meta = load_checkpoint(final)
    spec = spec_from_meta(meta["spec"])
    assert spec.num_groups == 3
    # prototypes were carried over from the (pushed, possibly pruned)
    # proto checkpoint
    proto_params, _, proto_meta = load_checkpoint(proto_ckpt)
    np.testing.assert_allclose(
        np.asarray(params["prototype_vectors"]),
        np.asarray(proto_params["prototype_vectors"]), rtol=1e-6)
    # group rows remain on the simplex after training
    gw = np.asarray(params["group_projection"])
    np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-4)
    assert (gw >= -1e-7).all()
    # stage checkpoints exist with reference naming
    ckpt_dir = os.path.dirname(final)
    for name in ("warmup-group_last.ckpt", "nopush-group_last.ckpt",
                 "push-group_last.ckpt"):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name
