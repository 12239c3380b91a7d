"""Analysis-suite smoke tests over a trained synthetic grouped run."""

import json
import os

import numpy as np
import pytest

from e2e_utils import (TINY_EM_CONFIG, TINY_GROUP_CONFIG,
                       build_synthetic_dataset)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = build_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_analysis")))
    # fake part annotations: part 1 = top half, part 2 = bottom half
    pid_dir = os.path.join(root, "annotations_PIDS", "val")
    os.makedirs(pid_dir, exist_ok=True)
    ann_dir = os.path.join(root, "annotations", "val")
    for f in os.listdir(ann_dir):
        ann = np.load(os.path.join(ann_dir, f))
        parts = np.zeros_like(ann, dtype=np.int64)
        h = ann.shape[0] // 2
        parts[:h][ann[:h] > 0] = 1
        parts[h:][ann[h:] > 0] = 2
        np.save(os.path.join(pid_dir, f), parts)

    results = tmp_path_factory.mktemp("results_analysis")
    os.environ["RESULTS_DIR"] = str(results)
    from scaleprotoseg_tpu.train_wandb_multiscale import train as tp
    from scaleprotoseg_tpu.finetune_wandb_group import train as tg
    cfg = results / "tiny.gin"
    cfg.write_text(TINY_EM_CONFIG.replace("train.joint_steps = 6",
                                          "train.joint_steps = 2")
                   .replace("train.finetune_steps = 4",
                            "train.finetune_steps = 0"))
    proto_ckpt = tp(str(cfg), "a_proto", data_root=root, num_workers=2)
    gcfg = results / "tiny_g.gin"
    gcfg.write_text(TINY_GROUP_CONFIG
                    .replace("train.warmup_steps = 3",
                             "train.warmup_steps = 2")
                    .replace("train.joint_steps = 4",
                             "train.joint_steps = 2"))
    tg(str(gcfg), "a_group", start_checkpoint=proto_ckpt,
       data_root=root, num_workers=2)
    return str(results), root


@pytest.mark.slow
def test_consistency_and_stability(setup):
    results, root = setup
    from scaleprotoseg_tpu.analysis.metrics.consistency import \
        run_consistency
    from scaleprotoseg_tpu.analysis.metrics.stability import run_stability
    score = run_consistency("a_proto", "push_final", "em",
                            results_root=results, data_root=root, limit=3)
    assert 0.0 <= score <= 1.0
    out = os.path.join(results, "a_proto", "metrics", "push_final")
    assert os.path.exists(os.path.join(
        out, "consistency_score_th_0.8_qt_0.8.txt"))
    stab = run_stability("a_proto", "push_final", "em",
                         results_root=results, data_root=root, limit=3)
    assert 0.0 <= stab <= 1.0


@pytest.mark.slow
def test_overlaps_and_composition(setup):
    results, root = setup
    from scaleprotoseg_tpu.analysis.prototype_overlap import \
        run_proto_activation
    from scaleprotoseg_tpu.analysis.group_overlap import run_group_overlap
    from scaleprotoseg_tpu.analysis.group_composition import group_comp
    df = run_proto_activation("a_proto", "push_final", "em", n_images=2,
                              results_root=results, data_root=root)
    assert (df.iou >= 0).all() and (df.iou <= 1).all()
    dg = run_group_overlap("a_group", "final-group", "em", n_images=2,
                           results_root=results, data_root=root)
    assert len(dg) > 0
    comp = group_comp("a_group", "final-group", results_root=results)
    # group rows are simplex-projected: each group has >= 1 member
    assert all(len(v) >= 1 for v in comp.values())


@pytest.mark.slow
def test_nearest_and_samples_and_failures(setup):
    results, root = setup
    from scaleprotoseg_tpu.analysis.nearest_img import nearest_img
    from scaleprotoseg_tpu.analysis.nearest_proto import nearest_proto
    from scaleprotoseg_tpu.analysis.sample_activations_prototype import \
        sample_activations
    from scaleprotoseg_tpu.analysis.sample_activations_group import \
        sample_activations_group
    from scaleprotoseg_tpu.analysis.failure_cases import failure_cases
    idx = nearest_img("a_proto", "push_final", "em", top_n=2, limit=3,
                      results_root=results, data_root=root,
                      save_plots=False)
    assert len(idx) == 24 or len(idx) > 0
    npz = nearest_proto("a_proto", "push_final", "em", top_k=3,
                        n_images=2, results_root=results, data_root=root,
                        save_plots=False)
    assert all(len(v) == 3 for v in npz.values())
    sample_activations("a_proto", "push_final", "em", n_images=1,
                       results_root=results, data_root=root)
    sample_activations_group("a_group", "final-group", "em", n_images=1,
                             results_root=results, data_root=root)
    failure_cases("a_proto", "push_final", "em", n_images=1,
                  results_root=results, data_root=root)


def test_decode_uids():
    from scaleprotoseg_tpu.data.panoptic_parts_lite import decode_uids
    uids = np.array([7, 26_004, 2_600_402, 0])
    sids, iids, pids = decode_uids(uids)
    np.testing.assert_array_equal(sids, [7, 26, 26, 0])
    np.testing.assert_array_equal(iids, [-1, 4, 4, -1])
    np.testing.assert_array_equal(pids, [-1, -1, 2, -1])
