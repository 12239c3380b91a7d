"""quant8-static follow-ups: backbone-only win + the Pallas-cliff probe.

bench_quant_static.py measured static quant8 at 1.055x the fully-XLA
bf16 serving path but 0.93x the Pallas-fast bf16 path.  Two questions:

  1. backbone-only: how much of the conv-level 1.44-1.78x s8 win
     survives in the full dilated-ResNet (layer4/5 quantized, rest
     bf16)?  Isolates the head from the comparison.
  2. cliff probe: does the int8-conv -> Pallas relayout cliff (3x,
     ops/quant.py, measured round 3 with DYNAMIC quant) still apply
     with static scales?  If not, quant8_static + fused ASPP/head
     would stack on the fast path's wins.

Run on the real TPU chip:  python benchmarks/bench_quant_static2.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship, synthetic_init
    from scaleprotoseg_tpu.model_loading import calibrate_quant_scales
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.serving import make_serving_fn

    B, H, W = 4, 1024, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)

    base, _ = _flagship(tiny=False, grouped=True, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: base.init(k, jnp.zeros((1, H, W, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = synthetic_init(shapes, seed=0)
    bb_vars = {"params": variables["params"]["backbone"]}
    if "batch_stats" in variables:
        bb_vars["batch_stats"] = variables["batch_stats"]["backbone"]

    # 1. backbone-only A/B (the ASPP head included; all-XLA both arms)
    for tag, quant8 in (("bb_bf16", False), ("bb_static", "static")):
        model, _ = _flagship(tiny=False, grouped=True,
                             dtype=jnp.bfloat16, quant8=quant8)
        bb = model.backbone
        v = bb_vars
        if quant8 == "static":
            qfwd = jax.jit(lambda vv, xx: bb.apply(
                vv, xx, mutable=["quant_scales"])[1]["quant_scales"])
            qs = qfwd(bb_vars, x[:1])
            v = {**bb_vars, "quant_scales": qs}
        fn = jax.jit(lambda vv, xx: jnp.sum(
            bb.apply(vv, xx).astype(jnp.float32)))
        rate = time_fn_pipelined(fn, v, x, iters=8)
        print(json.dumps({"metric": tag,
                          "ms_per_batch": round(1e3 / rate, 1),
                          "img_per_s": round(B * rate, 2)}), flush=True)

    # 2. cliff probe: static quant backbone + the full Pallas fast path
    # (make_serving_fn guards quant8 models onto the XLA path, so the
    # probe builds the guarded-off computation by hand)
    del dataclasses, make_serving_fn, calibrate_quant_scales  # probe only
    model, _ = _flagship(tiny=False, grouped=True, dtype=jnp.bfloat16,
                         quant8="static", fast_aspp=True)
    qfwd = jax.jit(lambda vv, xx: model.apply(
        vv, xx, train=False, mutable=["quant_scales"])[1]["quant_scales"])
    v = {**variables, "quant_scales": qfwd(variables, x[:1])}

    from scaleprotoseg_tpu.ops.pallas_upsample import (
        fused_upsample_argmax_sharded)

    def fast_fn(vv, xx):
        logits = model.apply(vv, xx, method="fast_logits")
        return fused_upsample_argmax_sharded(
            logits, xx.shape[1], xx.shape[2]).astype(jnp.uint8)

    rate = time_fn_pipelined(jax.jit(fast_fn), v, x, iters=8)
    print(json.dumps({"metric": "serving_static_plus_pallas_fast",
                      "ms_per_batch": round(1e3 / rate, 1),
                      "img_per_s": round(B * rate, 2)}), flush=True)


if __name__ == "__main__":
    main()
