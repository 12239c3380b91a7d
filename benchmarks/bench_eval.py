"""Eval-engine benchmark: the full user-facing validation step.

Measures SegEvaluator.update — flagship forward (fused-ASPP fast path)
+ bilinear logits upsample to label resolution (1024x2048x19, parity
with `eval_valid_multiscale.py:229-230`) + argmax + void-masked
confusion-matrix scatter — per image at Cityscapes full resolution.
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

    from __graft_entry__ import _flagship
    from scaleprotoseg_tpu.eval.miou import SegEvaluator

    model, spec = _flagship(tiny=False, grouped=True, fast_aspp=True)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    rng = np.random.default_rng(0)
    for batch in (1, 2):
        images = jnp.asarray(rng.random((batch, 1024, 2048, 3)),
                             jnp.bfloat16)
        targets = jnp.asarray(rng.integers(0, 20, (batch, 1024, 2048)),
                              jnp.int32)
        ev = SegEvaluator(model, spec.num_classes)
        ev.update(variables, images, targets)  # compile + warmup
        ev.result()
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            ev.update(variables, images, targets)
        ev._flush()  # updates dispatch async; sync before stopping clock
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "eval_step_1024x2048", "batch": batch,
            "value": round(batch * iters / dt, 2),
            "unit": "images/sec/chip",
            "ms_per_image": round(dt / iters / batch * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
