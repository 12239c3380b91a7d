"""Microbenchmarks: where the flagship inference time goes.

Run on the real TPU chip:  python benchmarks/microbench.py

Reports per-stage timings (backbone stem/res-layers/ASPP, prototype head
XLA vs fused Pallas) plus achieved FLOP/s, to direct optimization work.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu.models.deeplab import (ASPP, ResLayer, Stem)
    from scaleprotoseg_tpu.ops.pallas_proto import fused_proto_logits
    from scaleprotoseg_tpu.ops.prototype import (distance_to_similarity,
                                                 scale_l2_distances)
    from scaleprotoseg_tpu.profiling import (flops_estimate,
                                             time_fn_pipelined)
    from scaleprotoseg_tpu.spec import ProtoSpec

    rng = np.random.default_rng(0)
    B, H, W = 1, 1024, 2048
    results = {}

    def bench_fn(name, fn, *args, flops=None, iters=20):
        # scalar on-device reduce + pipelined timing: the tunnel's
        # per-call round-trip (~30 ms) and device->host transfers would
        # otherwise dominate
        g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        rate = time_fn_pipelined(g, *args, iters=iters)
        ms = 1e3 / rate
        results[name] = {
            "ms": round(ms, 2),
            "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 2)
            if flops else None,
        }
        print(name, results[name], flush=True)

    def bench_module(name, module, x, iters=20):
        variables = module.init(jax.random.PRNGKey(0), x)
        flops = flops_estimate(lambda v, xx: module.apply(v, xx),
                               variables, x)
        bench_fn(name, module.apply, variables, x, flops=flops,
                 iters=iters)
        return module.apply(variables, x)

    x = jnp.asarray(rng.random((B, H, W, 3)), jnp.bfloat16)
    h = bench_module("stem(/4)", Stem(dtype=jnp.bfloat16), x)
    h = bench_module("layer2", ResLayer(3, 64, 256, 1, 1,
                                        dtype=jnp.bfloat16), h)
    h = bench_module("layer3(/2)", ResLayer(4, 128, 512, 2, 1,
                                            dtype=jnp.bfloat16), h)
    h = bench_module("layer4(d2)x23", ResLayer(23, 256, 1024, 1, 2,
                                               dtype=jnp.bfloat16), h)
    h = bench_module("layer5(d4)", ResLayer(3, 512, 2048, 1, 4,
                                            dtype=jnp.bfloat16), h)
    bench_module("aspp", ASPP(64, (6, 12, 18, 24), "concat",
                              dtype=jnp.bfloat16), h)

    # fused one-pass Pallas ASPP (inference fast path)
    from scaleprotoseg_tpu.ops.pallas_aspp import fused_aspp
    aspp_mod = ASPP(64, (6, 12, 18, 24), "concat", dtype=jnp.bfloat16)
    av = aspp_mod.init(jax.random.PRNGKey(0), h)
    aw = [av["params"][f"c{i}"]["kernel"] for i in range(4)]
    ab = [av["params"][f"c{i}"]["bias"] for i in range(4)]
    aspp_flops = (h.shape[0] * h.shape[1] * h.shape[2]
                  * 9 * h.shape[3] * 64 * 4 * 2)
    bench_fn("aspp_pallas_fused", lambda x: fused_aspp(x, aw, ab), h,
             flops=aspp_flops)

    # prototype head: XLA vs fused Pallas at the real grid
    spec = ProtoSpec.equal_allocation(228, 64, 19, 4, num_groups=3)
    feats = jnp.asarray(rng.random((B, 129, 257, 256)), jnp.bfloat16)
    protos = jnp.asarray(rng.random((228, 64)), jnp.float32)
    w = jnp.asarray(rng.random((228, 19)), jnp.float32)

    @jax.jit
    def head_xla(f, p, w):
        d = scale_l2_distances(f, p, spec.scale_bounds)
        return jnp.sum(distance_to_similarity(d) @ w)

    rate = time_fn_pipelined(head_xla, feats, protos, w, iters=30)
    results["proto_head_xla"] = {"ms": round(1e3 / rate, 3)}
    print("proto_head_xla", results["proto_head_xla"], flush=True)

    fused = jax.jit(lambda f, p, w: jnp.sum(
        fused_proto_logits(f, p, w, spec)))
    rate = time_fn_pipelined(fused, feats, protos, w, iters=30)
    results["proto_head_pallas"] = {"ms": round(1e3 / rate, 3)}
    print("proto_head_pallas", results["proto_head_pallas"], flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
