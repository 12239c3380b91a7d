"""Eval CLI smoke tests over a trained synthetic run."""

import json
import os

import numpy as np
import pytest

@pytest.fixture(scope="module")
def trained_run(shared_tiny_run):
    # read-mostly consumer of the session's shared tiny run (conftest):
    # eval only ADDS evaluation/ artifacts under the run dir
    results, root, _cfg = shared_tiny_run
    os.environ["RESULTS_DIR"] = results
    return results, root


def test_eval_valid_multiscale(trained_run):
    results, root = trained_run
    from scaleprotoseg_tpu.eval_valid_multiscale import run_evaluation
    res = run_evaluation("shared_run", "push_final", batch_size=2,
                         data_type="em", data_root=root,
                         results_root=results)
    assert 0.0 <= res["mean_iou"] <= 1.0
    assert 0.0 <= res["pixel_accuracy"] <= 1.0
    out_dir = os.path.join(results, "shared_run", "evaluation", "push_final")
    with open(os.path.join(out_dir, "iou_scores.json")) as f:
        scores = json.load(f)
    assert set(scores) == {"background", "cell"}
    assert os.path.exists(os.path.join(out_dir, "mean_iou.txt"))
    assert os.path.exists(os.path.join(out_dir, "iou_per_class.png"))
    # top-K purity curve (reference semantics: percent of the K nearest
    # prototypes matching the prediction, K over the whole bank) +
    # sample visualizations
    with open(os.path.join(out_dir, "proto_purity.json")) as f:
        purity = json.load(f)["top_k_purity_percent"]
    # curve spans the whole (post-push-dedup) bank
    from scaleprotoseg_tpu.checkpoints.io import (load_checkpoint,
                                                  spec_from_meta)
    _, _, meta = load_checkpoint(os.path.join(
        results, "shared_run", "checkpoints", "push_final.ckpt"))
    assert len(purity) == spec_from_meta(meta["spec"]).num_prototypes
    assert all(0.0 <= v <= 100.0 + 1e-9 for v in purity)
    assert os.path.exists(os.path.join(
        out_dir, "class_prototypes_in_nearest_k.png"))
    samples = os.listdir(os.path.join(out_dir, "samples"))
    assert len(samples) >= 1


def test_fast_output_audit_on_trained_checkpoint(trained_run, monkeypatch):
    """--fast-output tie audit on REAL trained logits: the fused
    upsample+argmax path (ops/pallas_upsample.py, interpret mode here)
    must agree with the reference-parity XLA path on all but a vanishing
    fraction of pixels, with an mIoU delta within noise.  The kernel is
    bit-equal to argmax(separable-matmul upsample); flips vs the
    jax.image gather form can only come from fp32 summation ORDER at
    near-exact ties, which trained (non-random) logits rarely produce.
    The full-split, real-TPU version of this audit lives in
    benchmarks/bench_eval.py."""
    monkeypatch.setenv("SCALEPROTOSEG_FORCE_FAST_OUTPUT", "interpret")
    results, root = trained_run
    from scaleprotoseg_tpu.constants import convert_targets
    from scaleprotoseg_tpu.eval.miou import SegEvaluator, iou_from_confusion
    from scaleprotoseg_tpu.eval_valid_multiscale import _prepare_image
    from scaleprotoseg_tpu.model_loading import (load_model,
                                                 resolve_checkpoint)

    model_path = os.path.join(results, "shared_run")
    ckpt = resolve_checkpoint(model_path, "push_final")
    model, spec, variables = load_model(model_path, ckpt)

    img_dir = os.path.join(root, "img_with_margin_0", "val")
    ann_dir = os.path.join(root, "annotations", "val")
    names = sorted(p[:-4] for p in os.listdir(img_dir)
                   if p.endswith(".npy"))[:4]
    imgs, anns = [], []
    for n in names:
        img = np.load(os.path.join(img_dir, n + ".npy"))
        ann = np.load(os.path.join(ann_dir, n + ".npy"))
        if ann.ndim == 3:
            ann = ann[..., 0]
        ann = convert_targets(ann, "em").astype(np.int32)
        imgs.append(_prepare_image(img, ann.shape, "em"))
        anns.append(ann)
    images = np.stack(imgs).astype(np.float32)
    targets = np.stack(anns)

    ev_ref = SegEvaluator(model, spec.num_classes)
    ev_fast = SegEvaluator(model, spec.num_classes, fast_output=True)
    assert ev_fast.fast_output, "force env did not engage the fused path"
    ev_ref.update(variables, images, targets)
    ev_fast.update(variables, images, targets)
    cm_r, cm_f = ev_ref.cm, ev_fast.cm
    assert cm_r.sum() == cm_f.sum() > 0  # same valid-pixel universe
    flips = np.abs(cm_r - cm_f).sum() / 2
    total = cm_r.sum()
    assert flips / total <= 1e-3, (flips, total)
    _, miou_r, _ = iou_from_confusion(cm_r)
    _, miou_f, _ = iou_from_confusion(cm_f)
    assert abs(miou_r - miou_f) <= 2e-3, (miou_r, miou_f)


def test_eval_test_png_export(trained_run, tmp_path):
    results, shared_root = trained_run
    # fabricate a test split in a per-test COPY of the dataset — the
    # shared fixture's data root must stay unmodified (conftest contract)
    import shutil
    root = str(tmp_path / "data")
    shutil.copytree(shared_root, root)
    for sub in ("annotations", "img_with_margin_0"):
        shutil.copytree(os.path.join(root, sub, "val"),
                        os.path.join(root, sub, "test"))
    from scaleprotoseg_tpu.eval_test import run_evaluation
    out_dir = run_evaluation("shared_run", "push_final", batch_size=2,
                             data_root=root, results_root=results)
    pngs = [p for p in os.listdir(out_dir) if p.endswith(".png")]
    assert len(pngs) == 4
    from PIL import Image
    arr = np.asarray(Image.open(os.path.join(out_dir, pngs[0])))
    assert arr.ndim == 2  # grayscale id map


def test_cityscapes_train_id_to_source_lut():
    from scaleprotoseg_tpu.eval_test import train_id_to_source_lut
    lut = train_id_to_source_lut(pascal=False)
    # void -> 6 (the last official void id; reference's rev_origin['void'])
    assert lut[0] == 6
    assert lut[1] == 7       # road
    assert lut[2] == 8       # sidewalk
    assert lut[19] == 33     # bicycle
    lut_p = train_id_to_source_lut(pascal=True)
    assert lut_p[0] == 255   # void -> 255
    assert lut_p[1] == 0     # background
    assert lut_p[21] == 20


def test_confusion_matrix_einsum_exact():
    """The chunked one-hot einsum confusion update must equal the numpy
    bincount reference exactly (0/1 bf16 one-hots, fp32 accumulation)."""
    import numpy as np
    import jax.numpy as jnp
    from scaleprotoseg_tpu.eval.miou import SegEvaluator
    from scaleprotoseg_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(7)
    C = 7
    hp, wp = 13, 17
    H, W = 64, 96
    logits_np = rng.standard_normal((3, hp, wp, C)).astype(np.float32)

    class Dummy:
        def apply(self, variables, images, train):
            class Out:
                logits = jnp.asarray(logits_np)
            return Out()

    ev = SegEvaluator(Dummy(), C)
    targets = rng.integers(0, C + 1, (3, H, W)).astype(np.int32)
    images = np.zeros((3, H, W, 3), np.float32)
    ev.update({}, images, targets)
    ev._flush()
    got = ev.cm.copy()

    pred = np.asarray(jnp.argmax(
        resize_bilinear(jnp.asarray(logits_np), H, W), axis=-1))
    t = targets - 1
    valid = t >= 0
    ref = np.bincount(
        (t[valid] * C + pred[valid]).ravel(), minlength=C * C
    ).reshape(C, C).astype(np.float64)
    np.testing.assert_array_equal(got, ref)


def test_ade_eval_shape_protocol():
    """Single source of truth for the ADE eval resize arithmetic
    (shared by the eval CLI and benchmarks/bench_eval_datasets.py):
    aspect-preserving short-side-512, optional multiple-of rounding."""
    from scaleprotoseg_tpu.eval_valid_multiscale import ade_eval_shape

    # exact protocol: short side -> 512, other side scaled + rounded
    assert ade_eval_shape(512, 683) == (512, 683)
    assert ade_eval_shape(426, 640) == (512, 769)   # 640*512/426 = 769.2
    assert ade_eval_shape(1024, 2048) == (512, 1024)
    # rounding collapses near-identical shapes (the compile-count fix)
    assert ade_eval_shape(426, 640, 64) == (512, 768)
    assert ade_eval_shape(512, 683, 64) == (512, 704)  # 683 -> 10.67 -> 11*64
    # never rounds to zero
    assert ade_eval_shape(512, 520, 512) == (512, 512)


def test_eval_quant8_rejects_non_deeplab(trained_run):
    # --quant8 wiring: the flag reaches load_model, which refuses the
    # shared run's UNet backbone instead of silently evaluating fp
    results, root = trained_run
    from scaleprotoseg_tpu.eval_valid_multiscale import run_evaluation
    with pytest.raises(ValueError, match="quant8"):
        run_evaluation("shared_run", "push_final", batch_size=2,
                       data_type="em", data_root=root,
                       results_root=results, quant8=True)


@pytest.mark.slow
def test_eval_quant8_static_e2e(trained_run, tmp_path):
    """--quant8-static end-to-end: the eval CLI calibrates PTQ scales on
    the first --calib-images val images and runs the full protocol on
    the int8 serving graph, writing to evaluation/<phase>-quant8static
    so the mIoU delta vs the bf16 dir is the deployment accuracy cost."""
    results, root = trained_run
    import jax
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import synthetic_init
    from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
    from scaleprotoseg_tpu.model_loading import load_model
    from scaleprotoseg_tpu.spec import ProtoSpec
    from scaleprotoseg_tpu.eval_valid_multiscale import run_evaluation

    run = os.path.join(results, "q8run")
    os.makedirs(os.path.join(run, "checkpoints"), exist_ok=True)
    with open(os.path.join(run, "config.gin"), "w") as f:
        f.write(
            "construct_PPNet.base_architecture = "
            "'deeplabv2_resnet50_multiscale'\n"
            "construct_PPNet.prototype_activation_function = 'log'\n"
            "construct_PPNet.add_on_layers_type = 'deeplab_simple'\n"
            "deeplabv2_resnet50_features_multiscale."
            "deeplab_n_features = 16\n")
    spec = ProtoSpec.equal_allocation(8, 16, num_classes=2, num_scales=4)
    ckpt = os.path.join(run, "checkpoints", "push_final.ckpt")
    save_checkpoint(ckpt, {}, spec=spec)
    # load_model's exact construction -> matching synthetic variables
    model, _, _ = load_model(run, ckpt)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, x),
                            jax.random.PRNGKey(0))
    variables = synthetic_init(shapes)
    save_checkpoint(ckpt, variables["params"],
                    variables.get("batch_stats"), spec=spec)

    res_bf16 = run_evaluation("q8run", "push_final", batch_size=2,
                              data_type="em", data_root=root,
                              results_root=results)
    res = run_evaluation("q8run", "push_final", batch_size=2,
                         data_type="em", data_root=root,
                         results_root=results, quant8="static",
                         calib_images=2)
    assert 0.0 <= res["mean_iou"] <= 1.0
    out_dir = os.path.join(results, "q8run", "evaluation",
                           "push_final-quant8static")
    assert os.path.exists(os.path.join(out_dir, "mean_iou.txt"))
    # int8 is a rounding of the same function: on a synthetic-weights
    # model both paths must land in the same accuracy regime
    assert abs(res["mean_iou"] - res_bf16["mean_iou"]) < 0.2
    # the calibration log line is the evidence the scales were fitted
    with open(os.path.join(out_dir, "eval.log")) as f:
        assert "quant8 calibration: 2 batches" in f.read()


def test_eval_fp32_reference_protocol(trained_run):
    """--fp32 --exact-output: the Zenodo-parity arm — fp32/XLA forward
    (the reference evals in torch fp32) + XLA upsample path."""
    results, root = trained_run
    from scaleprotoseg_tpu.eval_valid_multiscale import run_evaluation
    res = run_evaluation("shared_run", "push_final", batch_size=2,
                         data_type="em", data_root=root,
                         results_root=results, fp32=True,
                         fast_output=False, limit=2)
    assert 0.0 <= res["mean_iou"] <= 1.0
    assert 0.0 <= res["pixel_accuracy"] <= 1.0
