"""End-to-end group-phase smoke: prototype checkpoint -> group bootstrap
-> warm/joint/last phases -> final-group checkpoint with invariants."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e pipeline: ~3 min on a 1-core host

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

    # run_pruning on the grouped run produces a loadable checkpoint whose
    # forward equals the original with the pruned prototypes' group
    # weights zeroed (the surgery re-packs group_projection columns)
    import jax
    import jax.numpy as jnp
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.run_pruning import run_pruning

    model_dir = os.path.dirname(ckpt_dir)
    pruned_path = run_pruning(str(group_cfg), "group_run", k=3,
                              prune_threshold=1, push_batch_size=2,
                              data_root=dataset_root)
    assert os.path.exists(pruned_path)
    model0, spec0, vars0 = load_model(model_dir, final)
    model1, spec1, vars1 = load_model(
        model_dir, os.path.join(model_dir, "pruned", "checkpoints",
                                "push_last.ckpt"))
    assert vars1["params"]["group_projection"].shape == \
        (spec1.num_classes, spec1.num_groups, spec1.max_protos_per_class)
    pruned_set = set(range(spec0.num_prototypes)) - set(
        int(np.argwhere((np.asarray(vars0["params"]["prototype_vectors"]) ==
                         v).all(-1))[0, 0])
        for v in np.asarray(vars1["params"]["prototype_vectors"]))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    gp = np.asarray(vars0["params"]["group_projection"]).copy()
    for c in range(spec0.num_classes):
        for j, p in enumerate(spec0.class_proto_index[c]):
            if int(p) in pruned_set:
                gp[c, :, j] = 0.0
    ref_params = dict(vars0["params"])
    ref_params["group_projection"] = jnp.asarray(gp)
    extra0 = {k: v for k, v in vars0.items() if k != "params"}
    out_ref = model0.apply({"params": ref_params, **extra0}, x, train=False)
    out_pruned = model1.apply(vars1, x, train=False)
    np.testing.assert_allclose(np.asarray(out_pruned.logits),
                               np.asarray(out_ref.logits),
                               rtol=1e-4, atol=1e-4)


def test_group_finetune_irregular_bank(dataset_root, tmp_path,
                                       monkeypatch):
    """Group bootstrap + pruning on a floor-division-leftover bank (10
    prototypes over 4 scales, the group_scaleproto_coco layout at toy
    scale): the proto checkpoint's irregular spec carries into the group
    model, training keeps the simplex, and run_pruning drops the
    dangling rows (their k-nearest purity is zero — they never appear in
    forward) with a loadable result."""
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "results"))
    from scaleprotoseg_tpu.train_wandb_multiscale import train as train_proto
    from scaleprotoseg_tpu.finetune_wandb_group import train as train_group

    irr = ("construct_PPNet.prototype_shape = (24, 8, 1, 1)",
           "construct_PPNet.prototype_shape = (10, 8, 1, 1)")
    proto_cfg = tmp_path / "tiny_em_irr.gin"
    proto_cfg.write_text(TINY_EM_CONFIG.replace(*irr).replace(
        "train.joint_steps = 6", "train.joint_steps = 2").replace(
        "train.finetune_steps = 4", "train.finetune_steps = 0"))
    proto_ckpt = train_proto(str(proto_cfg), "proto_irr",
                             data_root=dataset_root, num_workers=2)

    group_cfg = tmp_path / "tiny_group_irr.gin"
    group_cfg.write_text(TINY_GROUP_CONFIG.replace(
        "construct_PPNet_Group.prototype_shape = (24, 8, 1, 1)",
        "construct_PPNet_Group.prototype_shape = (10, 8, 1, 1)").replace(
        "train.joint_steps = 4", "train.joint_steps = 2"))
    final = train_group(str(group_cfg), "group_irr",
                        start_checkpoint=proto_ckpt,
                        data_root=dataset_root, num_workers=2)

    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    params, _, meta = load_checkpoint(final)
    spec = spec_from_meta(meta["spec"])
    assert spec.num_active_prototypes < spec.num_prototypes
    gw = np.asarray(params["group_projection"])
    np.testing.assert_allclose(gw.sum(-1), 1.0, rtol=1e-4)

    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.run_pruning import run_pruning
    pruned_path = run_pruning(str(group_cfg), "group_irr", k=3,
                              prune_threshold=1, push_batch_size=2,
                              data_root=dataset_root)
    model1, spec1, vars1 = load_model(
        os.path.dirname(os.path.dirname(final)), pruned_path)
    # the dangling rows can never reach their purity threshold (they
    # collect no nearest patches), so pruning removes them
    assert spec1.num_prototypes <= spec.num_active_prototypes
    assert spec1.num_active_prototypes == spec1.num_prototypes
    assert vars1["params"]["prototype_vectors"].shape[0] == \
        spec1.num_prototypes
