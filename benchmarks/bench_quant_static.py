"""End-to-end serving A/B: bf16 vs dynamic-quant8 vs static-quant8.

`bench_int8_forms.py` pinned the kernel-level facts: XLA's s8 conv
lowering runs 1.44-1.78x bf16 at serving shapes, and what sank the
round-3 dynamic quant8 was the per-conv dynamic quantize traffic.
This measures what the user actually gets: the full flagship PPNet
serving forward (labels out, fused upsample off for the quant arms —
the Pallas-layout cliff, ops/quant.py) at Cityscapes 1024x2048:

  bf16_fast     bf16 + fused Pallas ASPP/head/upsample (the 39 img/s
                headline path)
  bf16_xla      bf16, fully-XLA (the apples-to-apples baseline for the
                quant arms, which must run fully-XLA)
  quant8_dyn    dynamic w8a8 layer4/5 (the round-3 knob)
  quant8_static calibrated static scales (this round's speed path)

Run on the real TPU chip:  python benchmarks/bench_quant_static.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
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

    arms = []
    for tag, quant8, fast in (("bf16_fast", False, True),
                              ("bf16_xla", False, False),
                              ("quant8_dyn", True, False),
                              ("quant8_static", "static", False),
                              ("quant8_static_fast", "static", True)):
        model, _ = _flagship(tiny=False, grouped=True, dtype=jnp.bfloat16,
                             quant8=quant8, fast_aspp=fast)
        v = variables
        if quant8 == "static":
            v = calibrate_quant_scales(
                model, variables,
                [x[:1], x[1:2] * 0.8], log=None)
        fn = jax.jit(make_serving_fn(model, fast=fast))
        rate = time_fn_pipelined(fn, v, x, iters=8)
        rec = {"metric": f"serving_{tag}", "ms_per_batch":
               round(1e3 / rate, 1),
               "img_per_s": round(B * rate, 2)}
        arms.append((tag, B * rate))
        print(json.dumps(rec), flush=True)

    base_rate = dict(arms)["bf16_xla"]
    print(json.dumps({
        "metric": "quant8_static_vs_bf16_xla",
        "speedup": round(dict(arms)["quant8_static"] / base_rate, 3),
        "vs_bf16_fast": round(dict(arms)["quant8_static"] /
                              dict(arms)["bf16_fast"], 3)}), flush=True)


if __name__ == "__main__":
    main()
