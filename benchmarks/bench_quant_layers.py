"""Would static int8 on layer2/3 buy anything at serving shapes?

quant8 currently covers layer4/5 only (the FLOPs bulk; `models/deeplab.py`).
This isolates the remaining res-layers at the flagship serving shapes
(1024x2048, NHWC, batch 1) and A/Bs bf16 vs calibrated static int8
(`_QuantConv` static path), same-run.  Decision input for extending the
`quant8` scope: worth pursuing only if the isolated win is >=1.3x AND
the stage is a meaningful share of the ~25 ms/img forward.

Run on the real TPU chip:  python benchmarks/bench_quant_layers.py
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

    from scaleprotoseg_tpu.models.deeplab import ResLayer
    from scaleprotoseg_tpu.profiling import flops_estimate, time_fn_pipelined

    rng = np.random.default_rng(0)
    # serving activations feeding each layer (B, H, W, C) after the
    # /4 stem at 1024x2048
    stages = [
        ("layer2", ResLayer(3, 64, 256, 1, 1, dtype=jnp.bfloat16),
         (1, 256, 512, 64)),
        ("layer3", ResLayer(4, 128, 512, 2, 1, dtype=jnp.bfloat16),
         (1, 256, 512, 256)),
        # control: layer5 (already int8 in the shipped scope) to anchor
        # the isolated numbers against the known in-model win
        ("layer5", ResLayer(3, 512, 2048, 1, 4, dtype=jnp.bfloat16),
         (1, 128, 256, 1024)),
    ]

    results = {}
    for name, mod, shape in stages:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        variables = mod.init(jax.random.PRNGKey(0), x)
        flops = flops_estimate(lambda v, xx: mod.apply(v, xx), variables, x)

        def timed(tag, m, v):
            f = jax.jit(lambda v_, xx: jnp.sum(
                m.apply(v_, xx).astype(jnp.float32)))
            rate = time_fn_pipelined(f, v, x, iters=20)
            ms = 1e3 / rate
            results[f"{name}_{tag}"] = {
                "ms": round(ms, 2),
                "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 1),
            }
            print(name, tag, results[f"{name}_{tag}"], flush=True)
            return ms

        ms_bf16 = timed("bf16", mod, variables)

        qmod = dataclasses.replace(mod, quant8="static")
        # one-batch max calibration, then the immutable serving apply
        _, qcol = qmod.apply(variables, x, mutable=["quant_scales"])
        qvars = dict(variables)
        qvars["quant_scales"] = qcol["quant_scales"]
        ms_q = timed("int8_static", qmod, qvars)
        results[f"{name}_speedup"] = round(ms_bf16 / ms_q, 3)
        print(name, "speedup", results[f"{name}_speedup"], flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
