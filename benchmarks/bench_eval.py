"""Eval-engine benchmark: the full user-facing validation step.

Measures SegEvaluator.update — flagship forward (fused-ASPP fast path)
+ bilinear logits upsample to label resolution (1024x2048x19, parity
with `eval_valid_multiscale.py:229-230`) + argmax + void-masked
confusion-matrix scatter — per image at Cityscapes full resolution,
for BOTH prediction paths:

- default: XLA ``resize_bilinear`` -> argmax (reference-exact grid)
- ``--fast-output``: the fused Pallas upsample+argmax kernel
  (ops/pallas_upsample.py) that never materializes the 159 MB/image
  full-res logits.

Also audits the two paths against each other on the same (He-init,
non-degenerate) logits: pixels whose argmax flips can only come from
fp32 summation-order differences at near-exact ties, and the measured
flip rate is printed alongside the timing.  The trained-checkpoint
flip audit runs in tests/test_eval_cli.py (CPU, interpret mode).

This is the wall-clock a user sees from `eval_valid_multiscale` minus
host IO, complementing bench.py (model forward only).

Run on the real TPU chip:  python benchmarks/bench_eval.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship, synthetic_init
    from scaleprotoseg_tpu.eval.miou import SegEvaluator

    model, spec = _flagship(tiny=False, grouped=True, fast_aspp=True)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    # He-scaled random params: realistic (non-tie) logits so the argmax
    # and the flip audit are meaningful (all-zero params make every
    # class logit equal — 100% ties)
    variables = synthetic_init(shapes, seed=0)

    rng = np.random.default_rng(0)
    for batch in (1, 2):
        images = jnp.asarray(rng.random((batch, 1024, 2048, 3)),
                             jnp.bfloat16)
        targets = jnp.asarray(rng.integers(0, 20, (batch, 1024, 2048)),
                              jnp.int32)
        results = {}
        for fast_output in (False, True):
            ev = SegEvaluator(model, spec.num_classes,
                              fast_output=fast_output)
            ev.update(variables, images, targets)  # compile + warmup
            ev.result()
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                ev.update(variables, images, targets)
            ev._flush()  # updates dispatch async; sync before the clock
            dt = time.perf_counter() - t0
            results[fast_output] = ev.cm.copy()
            print(json.dumps({
                "metric": "eval_step_1024x2048", "batch": batch,
                "fast_output": fast_output,
                "value": round(batch * iters / dt, 2),
                "unit": "images/sec/chip",
                "ms_per_image": round(dt / iters / batch * 1e3, 2),
            }), flush=True)
        # near-tie flip audit: each flipped pixel moves one count between
        # confusion cells, so sum|dCM|/2 counts flips exactly
        flips = float(np.abs(results[False] - results[True]).sum() / 2)
        total = float(results[False].sum())
        print(json.dumps({
            "metric": "fast_output_argmax_flips", "batch": batch,
            "flipped_pixels": flips, "total_valid_pixels": total,
            "flip_rate": round(flips / total, 8),
        }), flush=True)

    # --quant8-static eval arm: the int8 serving graph under the same
    # evaluator (what `eval_valid_multiscale --quant8-static` runs) —
    # quantifies how much faster users can measure their PTQ accuracy
    from scaleprotoseg_tpu.model_loading import calibrate_quant_scales
    model_q8, _ = _flagship(tiny=False, grouped=True, fast_aspp=True,
                            quant8="static")
    batch = 2
    images = jnp.asarray(rng.random((batch, 1024, 2048, 3)), jnp.bfloat16)
    targets = jnp.asarray(rng.integers(0, 20, (batch, 1024, 2048)),
                          jnp.int32)
    variables_q8 = calibrate_quant_scales(
        model_q8, variables, [np.asarray(images, np.float32)])
    ev = SegEvaluator(model_q8, spec.num_classes, fast_output=True)
    ev.update(variables_q8, images, targets)
    ev.result()
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        ev.update(variables_q8, images, targets)
    ev._flush()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "eval_step_1024x2048_quant8_static", "batch": batch,
        "fast_output": True,
        "value": round(batch * iters / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_image": round(dt / iters / batch * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
