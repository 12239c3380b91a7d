"""Per-dataset training-step benchmark: ms/step + compile-time memory.

Proves the large-vocabulary configs fit on the chip (VERDICT r1 item 4):
for each shipped proto-phase config, builds the REAL config's model
(gin-driven: backbone, prototype bank, MSC input pyramid), compiles the
joint train step at the config's window/batch, reports ms/step and XLA's
``memory_analysis`` (argument/output/temp/generated-code sizes).  The
dense-KLD intermediates are the item under test at ADE (1800 protos,
150 classes) and COCO (2054 protos, 182 classes, batch 10) shapes.

Run on the real TPU chip:
    python benchmarks/bench_configs.py [--configs a,b,...] [--iters N]

Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

CONFIGS = ("scaleproto_cityscapes", "scaleproto_pascal", "scaleproto_ade",
           "scaleproto_coco", "scaleproto_em",
           "group_scaleproto_cityscapes", "group_scaleproto_coco",
           "group_scaleproto_ade")


def bench_config(name: str, iters: int = 8, fast_gradconv: bool = False,
                 fast_aspp: bool = False, remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from common_build import build_from_config
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.train.steps import make_train_step

    # the shared production-step builder (benchmarks/common_build.py):
    # the same assembly bench_trace_step / bench_step_decompose measure,
    # so the headline and the attribution benches price ONE step
    b = build_from_config(name, fast_gradconv=fast_gradconv,
                          fast_aspp=fast_aspp, remat=remat,
                          dtype=jnp.bfloat16, donate=False)
    model, spec, mhp = b.model, b.spec, b.mhp
    state, step, img, tgt = b.state, b.step, b.img, b.tgt

    record = {
        "metric": f"{name}_joint_train_step",
        "knobs": {"fast_gradconv": fast_gradconv, "fast_aspp": fast_aspp,
                  "remat": remat},
        "batch": b.batch, "window": list(b.window),
        "num_prototypes": spec.num_prototypes,
        "num_classes": spec.num_classes,
        "kld_weight": mhp["weights"].kld,
        "msc_scales": list(model.msc_scales),
    }
    try:
        compiled = jax.jit(step).lower(state, img, tgt).compile()
        mem = compiled.memory_analysis()
        if mem is not None:
            record["memory_mib"] = {
                "arguments": round(mem.argument_size_in_bytes / 2**20, 1),
                "outputs": round(mem.output_size_in_bytes / 2**20, 1),
                "temps": round(mem.temp_size_in_bytes / 2**20, 1),
                "code": round(mem.generated_code_size_in_bytes / 2**20, 1),
            }
            record["peak_estimate_gib"] = round(
                (mem.argument_size_in_bytes + mem.output_size_in_bytes +
                 mem.temp_size_in_bytes) / 2**30, 2)
    except Exception as e:
        record["memory_analysis_error"] = str(e)[:200]

    def one(state, img, tgt):
        _, metrics = step(state, img, tgt)
        return metrics["loss"]

    rate = time_fn_pipelined(one, state, img, tgt, iters=iters)
    record["ms_step_nondonated"] = round(1e3 / rate, 2)

    # headline: the PRODUCTION path — donate=True with the state
    # threaded through the loop exactly as train/runner.py runs it
    # (donate=False forces XLA to preserve the ~0.7 GB param+opt
    # argument buffers with copies; measured ~3 ms/step slower)
    import time as _time
    step_d = make_train_step(model, spec, b.tx, set(b.groups),
                             mhp["weights"],
                             ignore_void=mhp["ignore_void_class"],
                             project_group_simplex=(b.variant == "group"),
                             donate=True, remat=remat)
    state_d = jax.tree.map(jnp.copy, state)
    n_steps = max(4 * iters, 24)
    state_d, m = step_d(state_d, img, tgt)
    jax.device_get(m["loss"])                        # compile + sync
    t0 = _time.perf_counter()
    for _ in range(n_steps):
        state_d, m = step_d(state_d, img, tgt)
    jax.device_get(m["loss"])                        # sync the chain
    ms = (_time.perf_counter() - t0) / n_steps * 1e3
    record["value"] = round(ms, 2)
    record["unit"] = "ms/step"
    record["img_per_s"] = round(b.batch * 1e3 / ms, 2)
    rate = 1e3 / ms
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops:
            record["tflops_per_s"] = round(flops * rate / 1e12, 1)
    except Exception:
        pass
    return record


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", default=",".join(CONFIGS))
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--fast-gradconv", action="store_true",
                   help="shifted-matmul backward for dilated layer4/5 "
                   "convs (train.fast_gradconv)")
    p.add_argument("--fast-aspp", action="store_true",
                   help="fused Pallas ASPP fwd+VJP (train.fast_aspp)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialized backward (train.remat)")
    a = p.parse_args()
    for name in a.configs.split(","):
        try:
            print(json.dumps(bench_config(
                name.strip(), iters=a.iters,
                fast_gradconv=a.fast_gradconv, fast_aspp=a.fast_aspp,
                remat=a.remat)), flush=True)
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
