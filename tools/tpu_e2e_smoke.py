"""Full-product-surface training+serving smoke on the REAL TPU chip.

The CPU e2e tests (tests/test_e2e_train.py, test_e2e_group.py,
test_eval_cli.py) cover the pipeline stages under pytest; this script
drives the WHOLE product surface as one pipeline on the hosted TPU —
the reference's actual deliverable is the grouped model
(`segmentation/finetune_wandb_group.py:33-244`), so the hardware proof
reaches it:

  1. prototype phase with --tpu-recipe (warmup -> joint -> push ->
     last-layer; bf16 + fast knobs, `cli_common.TPU_RECIPE_BINDINGS`)
  2. group finetune from the proto checkpoint
     (warm-group -> joint-group -> last)
  3. threshold_save on the grouped weights
     (ref `analysis/threshold_save.py:11-35`)
  4. eval CLI on the grouped model, bf16 arm AND --quant8-static arm
     (ref protocol `eval_valid_multiscale.py:194-244`) — the delta
     between the two mean-IoUs is the int8 deployment-accuracy gate's
     measured number on a real trained checkpoint
  5. --export an AOT serving artifact from the grouped run
  6. serve a directory through the artifact (streaming engine)

Backbone is a tiny DeepLabV2-ResNet50 (tests/e2e_utils.py
TINY_RESNET_CONFIG): --quant8-static requires the ResNet conv stack.
Synthetic 2-class blob data in the reference's on-disk layout.

Usage:  python tools/tpu_e2e_smoke.py     # on the TPU host
Prints one JSON line with per-stage wall seconds, the bf16 and int8
mean-IoUs and their delta, and the serving throughput.  Measured ~9 min
wall on this 1-core tunnel host (r5, twice): the training stages are
dominated by per-phase compiles and the ~30 ms/call host<->device
round-trip, so a PCIe-attached host runs it far faster; a persistent
compile cache at ~/.cache/scaleprotoseg_tpu/tpu_smoke_cache helps only
across runs of IDENTICAL code.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/scaleprotoseg_tpu/tpu_smoke_cache"))


def main() -> int:
    work = tempfile.mkdtemp(prefix="tpu_e2e_")
    results = os.path.join(work, "results")
    os.environ["RESULTS_DIR"] = results
    os.environ["LOG_DIR"] = os.path.join(work, "logs")

    from e2e_utils import (TINY_GROUP_RESNET_CONFIG, TINY_RESNET_CONFIG,
                           build_synthetic_dataset)

    import jax

    backend = jax.default_backend()
    dataset_root = build_synthetic_dataset(os.path.join(work, "data"))
    proto_cfg = os.path.join(work, "tiny_resnet.gin")
    with open(proto_cfg, "w") as f:
        f.write(TINY_RESNET_CONFIG)
    group_cfg = os.path.join(work, "tiny_group_resnet.gin")
    with open(group_cfg, "w") as f:
        f.write(TINY_GROUP_RESNET_CONFIG)

    stages = {}

    def stage(name):
        t0 = time.time()

        def done():
            stages[name] = round(time.time() - t0, 1)
        return done

    # ---- 1. prototype phase, TPU recipe on --------------------------
    from scaleprotoseg_tpu.train_wandb_multiscale import train as train_proto
    d = stage("proto_recipe")
    proto_final = train_proto(proto_cfg, "smoke_proto",
                              data_root=dataset_root, num_workers=2,
                              tpu_recipe=True)
    d()
    assert os.path.exists(proto_final), proto_final
    # push-stage invariants (carried over from the pre-r5 smoke): the
    # checkpoint family, a non-empty pushed-prototype book, and logged
    # validation metrics — a silently-empty push or a broken metrics
    # sink must fail here, not surface as a weird group-finetune result
    proto_dir = os.path.dirname(os.path.dirname(proto_final))
    for name in ("nopush_last.ckpt", "push_last.ckpt", "push_final.ckpt"):
        assert os.path.exists(os.path.join(proto_dir, "checkpoints",
                                           name)), name
    with open(os.path.join(proto_dir, "prototypes",
                           "unique_prototypes.json")) as f:
        assert len(json.load(f)) >= 1
    with open(os.path.join(proto_dir, "metrics.jsonl")) as f:
        accs = [json.loads(line).get("val_accuracy")
                for line in f if "val_accuracy" in line]
    assert accs, "no val_accuracy logged"

    # ---- 2. group finetune ------------------------------------------
    from scaleprotoseg_tpu.finetune_wandb_group import train as train_group
    d = stage("group_finetune")
    group_final = train_group(group_cfg, "smoke_group",
                              start_checkpoint=proto_final,
                              data_root=dataset_root, num_workers=2,
                              tpu_recipe=True)
    d()
    assert os.path.basename(group_final) == "final-group.ckpt"

    # ---- 3. threshold_save ------------------------------------------
    from scaleprotoseg_tpu.analysis.threshold_save import threshold_save
    d = stage("threshold_save")
    th_path = threshold_save("smoke_group", "final-group", 0.05,
                             results_root=results)
    d()
    assert os.path.exists(th_path), th_path

    # ---- 4. eval CLI: bf16 arm, then the int8 accuracy gate ---------
    from scaleprotoseg_tpu.eval_valid_multiscale import run_evaluation
    d = stage("eval_bf16")
    res_bf16 = run_evaluation("smoke_group", "final-group", batch_size=2,
                              data_type="em", data_root=dataset_root,
                              results_root=results)
    d()
    d = stage("eval_quant8_static")
    res_q8 = run_evaluation("smoke_group", "final-group", batch_size=2,
                            data_type="em", data_root=dataset_root,
                            results_root=results, quant8="static",
                            calib_images=2)
    d()
    miou_delta = float(res_bf16["mean_iou"]) - float(res_q8["mean_iou"])

    # ---- 5. export an AOT serving artifact --------------------------
    from scaleprotoseg_tpu.serving.serve import main as serve_main
    img_dir = os.path.join(dataset_root, "img_with_margin_0", "val")
    artifact = os.path.join(work, "artifact")
    d = stage("export")
    serve_main(["smoke_group", "final-group", "--input", img_dir,
                "--export", artifact, "--batch", "2",
                "--results-root", results])
    d()
    assert os.path.exists(os.path.join(artifact, "module.bin"))

    # ---- 6. serve from the artifact ---------------------------------
    preds = os.path.join(work, "preds")
    d = stage("serve")
    serve_res = serve_main(["--artifact", artifact, "--input", img_dir,
                            "--output", preds, "--batch", "2",
                            "--results-root", results])
    d()
    n_preds = len(os.listdir(preds))
    assert n_preds >= 4, n_preds

    print(json.dumps({
        "ok": True, "backend": backend,
        "wall_s": round(sum(stages.values()), 1), "stages_s": stages,
        "mean_iou_bf16": round(float(res_bf16["mean_iou"]), 4),
        "mean_iou_quant8_static": round(float(res_q8["mean_iou"]), 4),
        "miou_delta_bf16_minus_int8": round(miou_delta, 4),
        "serve_img_per_s": round(float(serve_res.get("img_per_s", 0.0)), 2)
        if isinstance(serve_res, dict) else None,
        "n_predictions": n_preds, "results_dir": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
