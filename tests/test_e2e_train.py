"""End-to-end smoke: full prototype-phase CLI (warmup->joint->push->last)
and push invariants, on the synthetic blob dataset (SURVEY.md §4 #3)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e pipeline: ~3 min on a 1-core host

from e2e_utils import TINY_EM_CONFIG, build_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_em")
    return build_synthetic_dataset(str(root))


@pytest.fixture(autouse=True)
def _results_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "results"))
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))


def test_full_prototype_phase_pipeline(dataset_root, tmp_path):
    from scaleprotoseg_tpu.train_wandb_multiscale import train
    cfg = tmp_path / "tiny_em.gin"
    cfg.write_text(TINY_EM_CONFIG)

    final = train(str(cfg), "e2e_run", data_root=dataset_root,
                  num_workers=2,
                  gin_overrides=["train.profile_steps = 2"])
    assert os.path.exists(final)

    results_dir = os.path.dirname(os.path.dirname(final))
    # train.profile_steps captured a steady-state XProf trace
    trace_files = []
    for dirpath, _, names in os.walk(os.path.join(results_dir, "profile")):
        trace_files += [n for n in names if n.endswith(".xplane.pb")]
    assert trace_files, "profiler trace missing under <run>/profile"
    ckpt_dir = os.path.join(results_dir, "checkpoints")
    for name in ("nopush_last.ckpt", "push_last.ckpt", "push_final.ckpt",
                 "push_last.ckpt.json"):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name
    # push artifacts
    proto_dir = os.path.join(results_dir, "prototypes")
    with open(os.path.join(proto_dir, "unique_prototypes.json")) as f:
        unique = json.load(f)
    assert len(unique) >= 1
    info = np.load(os.path.join(proto_dir, "push_info.npz"))
    assert info["best_img"].shape[0] == 24
    # metrics were logged with reference names
    with open(os.path.join(results_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any("val_accuracy" in r for r in records)
    assert any("train_cross_entropy" in r for r in records)
    assert any(r.get("training_stage") == 2.0 for r in records)
    # learning sanity: the blob task is separable; joint training should
    # beat chance (0.5) within a handful of steps
    joint_acc = [r["val_accuracy"] for r in records
                 if r.get("training_stage") == 1.0 and "val_accuracy" in r]
    assert joint_acc and max(joint_acc) > 0.55, joint_acc

    # final checkpoint loads and its spec matches the (possibly pruned) bank
    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    params, _, meta = load_checkpoint(final)
    spec = spec_from_meta(meta["spec"])
    assert params["prototype_vectors"].shape[0] == spec.num_prototypes
    assert params["last_layer"].shape == (spec.num_prototypes, 2)


def test_push_projects_onto_real_patches(dataset_root, tmp_path):
    """After push, every matched prototype equals an actual encoded patch
    feature (distance ~0 at its winner pixel)."""
    import jax
    import jax.numpy as jnp
    from scaleprotoseg_tpu import cli_common, configlib
    from scaleprotoseg_tpu.models.factory import construct_PPNet
    from scaleprotoseg_tpu.push.push import push_prototypes

    cfg = tmp_path / "tiny_em2.gin"
    cfg.write_text(TINY_EM_CONFIG)
    cli_common.load_config(str(cfg))
    model, spec = construct_PPNet(variant="multiscale")
    x = jnp.zeros((1, 32, 32, 3))
    variables = dict(model.init(jax.random.PRNGKey(0), x))

    push_loader = cli_common.make_push_loader(batch_size=2,
                                              data_root=dataset_root)
    result = push_prototypes(model, variables, spec, push_loader,
                             dedup=False, log=lambda *a: None)
    new_pv = np.asarray(result.params["prototype_vectors"])
    old_pv = np.asarray(variables["params"]["prototype_vectors"])
    matched = result.winners >= 0
    assert matched.any()
    # matched prototypes moved onto real patch features in [0, 1] (sigmoid)
    assert not np.allclose(new_pv[matched], old_pv[matched])
    assert (new_pv[matched] >= 0).all() and (new_pv[matched] <= 1).all()
    # verify one prototype's distance at its winner is ~0 after push
    vars2 = {"params": dict(result.params)}
    if "batch_stats" in variables:
        vars2["batch_stats"] = variables["batch_stats"]
    p = int(np.nonzero(matched)[0][0])
    win = int(result.winners[p])
    images, targets = next(iter(
        cli_common.make_push_loader(batch_size=len(push_loader.dataset),
                                    data_root=dataset_root)))
    feats, dists = model.apply(vars2, jnp.asarray(images[win:win + 1]),
                               method="push_forward")
    dmin = float(np.min(np.asarray(dists)[0, :, :, p]))
    assert dmin < 1e-6, dmin


def test_irregular_bank_pipeline(dataset_root, tmp_path):
    """Full CLI pipeline with a floor-division-leftover bank (10
    prototypes over 4 scales -> 8 active), the group_scaleproto_coco
    layout at toy scale: train -> push -> finetune runs, danglers stay
    unpushed, and the final checkpoint round-trips the irregular spec."""
    from scaleprotoseg_tpu.train_wandb_multiscale import train
    cfg = tmp_path / "tiny_irr.gin"
    cfg.write_text(TINY_EM_CONFIG.replace(
        "construct_PPNet.prototype_shape = (24, 8, 1, 1)",
        "construct_PPNet.prototype_shape = (10, 8, 1, 1)"
    ).replace("train.joint_steps = 6", "train.joint_steps = 2"
              ).replace("train.finetune_steps = 4",
                        "train.finetune_steps = 1"))
    final = train(str(cfg), "irr_run", data_root=dataset_root,
                  num_workers=2)
    results_dir = os.path.dirname(os.path.dirname(final))
    info = np.load(os.path.join(results_dir, "prototypes",
                                "push_info.npz"))
    assert info["best_img"].shape[0] == 10
    assert (info["best_img"][8:] == -1).all()      # danglers unpushed
    assert (info["best_img"][:8] >= 0).all()

    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    params, _, meta = load_checkpoint(final)
    spec = spec_from_meta(meta["spec"])
    assert spec.num_active_prototypes == spec.scale_bounds[-1][1]
    assert params["prototype_vectors"].shape[0] == spec.num_prototypes
