"""Serving-path benchmark: the AOT artifact vs the in-process jit.

Exports the flagship grouped model (fused Pallas ASPP + head, bf16,
batch 4 at Cityscapes 1024x2048), saves + reloads the artifact, and
measures:

  1. ``artifact_img_per_s``  — steady-state device throughput of the
     deserialized StableHLO module (the deployable path);
  2. ``jit_img_per_s``       — same forward through in-process jit
     (bench.py's path) for comparison;
  3. ``pipeline_host_img_per_s`` — ServingEngine end-to-end with HOST
     preprocessing (fp32 normalize + bf16 on the wire).  On this
     single-core host the per-image float pass and the fat transfers
     bound this number — it measures the pipeline machinery;
  4. ``pipeline_u8_img_per_s``   — same stream with the default
     DEVICE preprocessing (raw uint8 on the wire, normalization in
     the served graph, uint8 labels back): 4x less data each way and
     no host float pass;
  5. ``quant8_img_per_s``    — the shipped quant8 config (dynamic
     w8a8 int8 layer4/5, fully-XLA path — exactly what
     ``load_model(quant8=True, fast=True)`` builds).  Expected BELOW
     bf16 — quant8 is a memory/accuracy knob (`ops/quant.py` has the
     measured breakdown, incl. why every Pallas kernel must stay off
     under quant8).

Claim under test: export/deserialize adds no throughput cost — the
artifact serves at the jit path's img/s (ratio ~1.0 within the hosted
tunnel's run-to-run variance).

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def _measure(predict, x, iters: int) -> float:
    """bench.py's pipelined steady-state timing (device_get = sync)."""
    import jax

    jax.device_get(predict(x))  # compile/load + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = predict(x)
    jax.device_get(out)
    return x.shape[0] * iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship
    from scaleprotoseg_tpu.cli_common import enable_compilation_cache
    from scaleprotoseg_tpu.serving import (ServingEngine, export_serving,
                                           load_artifact, make_serving_fn,
                                           save_artifact)

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    batch, h, w = (4, 1024, 2048) if on_tpu else (2, 129, 129)

    model, spec = _flagship(tiny=not on_tpu, grouped=True,
                            fast_aspp=on_tpu)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    data = np.random.default_rng(0).random((batch, h, w, 3),
                                           dtype=np.float32)
    x = jnp.asarray(data, jnp.bfloat16)
    iters = 16 if on_tpu else 4

    fn = jax.jit(make_serving_fn(model, fast=on_tpu))
    jit_rate = _measure(lambda a: fn(variables, a), x, iters)
    print(json.dumps({"metric": "serving_jit_img_per_s",
                      "value": round(jit_rate, 3), "batch": batch,
                      "shape": [h, w]}))

    exported = export_serving(model, variables, height=h, width=w,
                              batch=batch, fast=on_tpu)
    with tempfile.TemporaryDirectory() as tmp:
        art = os.path.join(tmp, "artifact")
        save_artifact(art, exported, variables, spec=spec)
        module_mb = os.path.getsize(os.path.join(art, "module.bin")) / 2**20
        served = load_artifact(art)
        art_rate = _measure(served.predict, x, iters)
        print(json.dumps({"metric": "serving_artifact_img_per_s",
                          "value": round(art_rate, 3),
                          "module_mb": round(module_mb, 2),
                          "vs_jit": round(art_rate / jit_rate, 3)}))

        n_stream = batch * 8

        def run_pipeline(predict, preprocess, metric):
            engine = ServingEngine(predict, batch, preprocess=preprocess,
                                   workers=2)
            for _ in engine.run((f"w{i}", i) for i in range(batch)):
                pass  # warmup
            t0 = time.perf_counter()
            count = sum(1 for _ in engine.run(
                (f"s{i}", i) for i in range(n_stream)))
            dt = time.perf_counter() - t0
            print(json.dumps({"metric": metric,
                              "value": round(count / dt, 3),
                              "images": count}))

        host_pre = lambda i: np.asarray(  # noqa: E731
            data[i % batch], jnp.bfloat16)
        run_pipeline(served.predict, host_pre,
                     "serving_pipeline_host_img_per_s")

        raw = (data * 255).astype(np.uint8)
        fn_u8 = jax.jit(make_serving_fn(model, fast=on_tpu,
                                        normalize_to=jnp.bfloat16))
        run_pipeline(lambda xb: fn_u8(variables, xb),
                     lambda i: raw[i % batch],
                     "serving_pipeline_u8_img_per_s")

    # the shipped quant8 config is fully-XLA: the int8 activation
    # layout + any Pallas call's layout constraint measured a 3x
    # whole-model cliff (ops/quant.py).  fast=on_tpu here exercises
    # make_serving_fn's own quant8 guard (it must drop the flag).
    model_q8, _ = _flagship(tiny=not on_tpu, grouped=True,
                            fast_aspp=False, quant8=True)
    fn_q8 = jax.jit(make_serving_fn(model_q8, fast=on_tpu))
    q8_rate = _measure(lambda a: fn_q8(variables, a), x, iters)
    print(json.dumps({"metric": "serving_quant8_img_per_s",
                      "value": round(q8_rate, 3),
                      "vs_bf16": round(q8_rate / jit_rate, 3)}))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import retry_reexec  # shared transient-tunnel policy

    retry_reexec(main)
