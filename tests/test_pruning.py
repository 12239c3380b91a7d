"""find_nearest / prune / run_pruning / threshold_save integration tests."""

import json
import os

import numpy as np
import pytest

from e2e_utils import TINY_GROUP_CONFIG, build_synthetic_dataset


@pytest.fixture(scope="module")
def trained(shared_tiny_run):
    # consumer of the session's shared tiny run (conftest): pruning only
    # ADDS pruned/ + th-* artifacts, never rewrites the push checkpoints
    results, root, cfg = shared_tiny_run
    os.environ["RESULTS_DIR"] = results
    return results, root, cfg


def test_find_nearest_labels_shape_and_range(trained):
    results, root, cfg = trained
    from scaleprotoseg_tpu import cli_common
    from scaleprotoseg_tpu.find_nearest import (
        find_k_nearest_patches_to_prototypes)
    from scaleprotoseg_tpu.model_loading import load_model
    model_dir = os.path.join(results, "shared_run")
    model, spec, variables = load_model(
        model_dir, os.path.join(model_dir, "checkpoints",
                                "push_last.ckpt"))
    cli_common.load_config(cfg)
    loader = cli_common.make_push_loader(batch_size=2, data_root=root)
    labels = find_k_nearest_patches_to_prototypes(
        loader, model, variables, spec, k=3, log=lambda *a: None)
    assert labels.shape == (spec.num_prototypes, 3)
    # k nearest come from distinct images: with 8 train images all
    # prototypes should have 3 valid (>= -1) labels in class range
    assert labels.max() < spec.num_classes
    assert labels.min() >= -1


def test_run_pruning_and_threshold_save(trained):
    results, root, cfg = trained
    from scaleprotoseg_tpu.run_pruning import run_pruning
    out = run_pruning(cfg, "shared_run", k=3, prune_threshold=1,
                      push_batch_size=2, data_root=root,
                      results_root=results)
    assert os.path.exists(out)
    from scaleprotoseg_tpu.checkpoints.io import load_checkpoint
    params, _, meta = load_checkpoint(out)
    kept = meta["extra"]["kept"]
    assert params["prototype_vectors"].shape[0] == len(kept)
    assert params["last_layer"].shape[0] == len(kept)
    # bookkeeping artifacts
    model_dir = os.path.join(results, "shared_run")
    book = [d for d in os.listdir(model_dir)
            if d.startswith("pruned_prototypes_")]
    assert book
    info = np.load(os.path.join(model_dir, book[0], "prune_info.npy"))
    assert info.shape[1] == 2 or info.size == 0
    with open(os.path.join(model_dir, book[0],
                           "prototypes_to_keep.json")) as f:
        assert json.load(f) == kept


def test_grouped_prune_surgery_forward_parity():
    """Pruning a grouped model re-packs group_projection against the new
    class_proto_index: the pruned model's logits must equal the original
    model's with the pruned prototypes' group weights zeroed (removing a
    prototype removes its w*act term from every group score)."""
    import jax
    import jax.numpy as jnp
    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.push.push import prune_model_params
    from scaleprotoseg_tpu.spec import ProtoSpec

    spec = ProtoSpec.equal_allocation(24, 8, 3, 4, num_groups=3)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat")

    def build(s):
        return PPNet(backbone=backbone, spec=s, backbone_channels=32,
                     grouped=True)

    model = build(spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 33, 33, 3)),
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    extra = {k: v for k, v in variables.items() if k != "params"}

    to_prune = [0, 5, 7, 13, 18, 23]   # spans all scales and classes
    new_spec = spec.prune(to_prune)
    keep = spec.keep_indices(to_prune)
    new_params = prune_model_params(dict(variables["params"]), keep,
                                    old_spec=spec, new_spec=new_spec)
    assert new_params["prototype_vectors"].shape[0] == len(keep)
    assert new_params["group_projection"].shape[-1] == \
        new_spec.max_protos_per_class
    out_pruned = build(new_spec).apply({"params": new_params, **extra}, x,
                                       train=False)

    gp = np.asarray(variables["params"]["group_projection"]).copy()
    pruned_set = set(to_prune)
    for c in range(spec.num_classes):
        for j, p in enumerate(spec.class_proto_index[c]):
            if int(p) in pruned_set:
                gp[c, :, j] = 0.0
    ref_params = dict(variables["params"])
    ref_params["group_projection"] = jnp.asarray(gp)
    out_ref = model.apply({"params": ref_params, **extra}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_pruned.logits),
                               np.asarray(out_ref.logits),
                               rtol=1e-5, atol=1e-5)


def test_grouped_prune_requires_specs():
    """Silent grouped misalignment is now impossible: surgery without the
    spec pair raises."""
    import jax.numpy as jnp
    from scaleprotoseg_tpu.push.push import prune_model_params
    params = {"prototype_vectors": jnp.zeros((4, 2)),
              "group_projection": jnp.zeros((2, 3, 2))}
    with pytest.raises(ValueError, match="grouped"):
        prune_model_params(params, np.array([0, 2]))


def test_threshold_save_zeroes_group_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path))
    # fabricate a grouped checkpoint
    import jax, jax.numpy as jnp
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.spec import ProtoSpec
    spec = ProtoSpec.equal_allocation(24, 8, 3, 4, num_groups=3)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32, grouped=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 33, 33, 3)))
    run = tmp_path / "g_run" / "checkpoints"
    save_checkpoint(str(run / "final-group.ckpt"), variables["params"],
                    variables.get("batch_stats"), spec=spec,
                    extra={"variant": "group"})
    from scaleprotoseg_tpu.analysis.threshold_save import threshold_save
    out = threshold_save("g_run", "final-group", 0.2)
    assert os.path.basename(out) == "th-0.2-final-group_last.ckpt"
    from scaleprotoseg_tpu.checkpoints.io import load_checkpoint
    params, _, _ = load_checkpoint(out)
    gw = np.asarray(params["group_projection"])
    assert ((gw == 0) | (gw >= 0.2)).all()
