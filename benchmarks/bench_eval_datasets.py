"""Eval wall-clock across every dataset's shape regime.

Round-2 VERDICT weak #4: `eval_valid_multiscale` buckets identical
shapes and "falls back to singleton shape buckets" for variable-size
datasets — each distinct shape costs one XLA compile of the full
forward.  Cityscapes (one shape) was measured; ADE (~2000 val images of
heterogeneous aspect at short-side 512) and COCO (native sizes) were
not.  This benchmark measures, per dataset regime, with each dataset's
REAL config model (gin-driven prototype bank / classes / backbone):

  - compile cost: ms for the first occurrence of each distinct shape
  - steady state: ms/image once shapes are warm
  - the effect of ``shape_multiple=64`` rounding on the number of
    distinct ADE shapes (the documented mitigation)

Run on the real TPU chip:  python benchmarks/bench_eval_datasets.py
Prints one JSON line per (dataset, variant).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

# Representative val-image source sizes (H, W) per dataset.  ADE/COCO
# sizes drawn from their real val distributions (mixed aspect ratios).
ADE_SOURCE = [(512, 683), (512, 768), (683, 512), (512, 512),
              (426, 640), (512, 640), (640, 512), (512, 686),
              (512, 769), (480, 640), (512, 684), (375, 500)]
COCO_SOURCE = [(480, 640), (426, 640), (640, 480), (500, 375),
               (480, 640), (427, 640), (640, 427), (375, 500)]


def regimes():
    # the ADE target shapes use the eval CLI's own resize arithmetic
    # (single source of truth) so the benchmark cannot drift from what
    # eval actually compiles
    from scaleprotoseg_tpu.eval_valid_multiscale import ade_eval_shape

    yield "cityscapes", "scaleproto_cityscapes", [(1024, 2048)] * 4
    yield "pascal", "scaleproto_pascal", [(513, 513)] * 4
    yield "em", "scaleproto_em", [(512, 512)] * 4
    yield ("ade_exact", "scaleproto_ade",
           [ade_eval_shape(h, w) for h, w in ADE_SOURCE])
    yield ("ade_mult64", "scaleproto_ade",
           [ade_eval_shape(h, w, 64) for h, w in ADE_SOURCE])
    yield "coco", "scaleproto_coco", COCO_SOURCE


def bench_regime(name: str, config: str, shapes) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu import cli_common, configlib
    from scaleprotoseg_tpu.eval.miou import SegEvaluator
    from scaleprotoseg_tpu.models.factory import construct_PPNet

    configlib.clear_config()
    cli_common.load_config(config)
    variant = "multiscale" if configlib.query("PPNetMultiScale",
                                              "num_scales", None) else \
        "single"
    model, spec = construct_PPNet(variant=variant, pretrained=False,
                                  dtype=jnp.bfloat16)
    if hasattr(model.backbone, "fast_aspp"):
        # production eval path: load_model(fast=True)
        import dataclasses
        model = dataclasses.replace(
            model,
            backbone=dataclasses.replace(model.backbone, fast_aspp=True))
    shapes_init = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             shapes_init)

    rng = np.random.default_rng(0)
    imgs = {s: jnp.asarray(rng.random((1,) + s + (3,)), jnp.bfloat16)
            for s in set(shapes)}
    tgts = {s: jnp.asarray(
        rng.integers(0, spec.num_classes + 1, (1,) + s), jnp.int32)
        for s in set(shapes)}

    ev = SegEvaluator(model, spec.num_classes)
    # pass 1: compile cost per distinct shape + first-epoch wall-clock
    t0 = time.perf_counter()
    compile_ms = {}
    for s in shapes:
        t1 = time.perf_counter()
        ev.update(variables, imgs[s], tgts[s])
        ev._flush()
        dt = (time.perf_counter() - t1) * 1e3
        compile_ms.setdefault(s, round(dt, 1))
    cold_wall = time.perf_counter() - t0

    # pass 2: steady state (every shape warm), pipelined
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for s in shapes:
            ev.update(variables, imgs[s], tgts[s])
    ev._flush()
    warm_wall = time.perf_counter() - t0

    return {
        "metric": f"eval_{name}",
        "config": config,
        "n_images": len(shapes),
        "distinct_shapes": len(set(shapes)),
        "first_epoch_s": round(cold_wall, 1),
        "compile_ms_per_new_shape": round(
            float(np.mean(list(compile_ms.values()))), 1),
        "warm_ms_per_image": round(
            warm_wall / (reps * len(shapes)) * 1e3, 2),
        "num_prototypes": spec.num_prototypes,
        "num_classes": spec.num_classes,
    }


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, config, shapes in regimes():
        if only and name not in only:
            continue
        try:
            print(json.dumps(bench_regime(name, config, shapes)),
                  flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"eval_{name}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
