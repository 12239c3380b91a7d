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
  5. ``wire_roofline_img_per_s`` — the transfer ceiling of THIS
     host<->device link for exactly the pipeline's traffic (uint8
     input batch up, uint8 label batch down), measured with raw
     ``device_put``/``device_get``.  The upload leg is DECOMPOSED, not
     halved: t_in = (put+get round trip) − (measured download of the
     same-size array), so no link-symmetry assumption enters the
     number; a tiny-transfer RTT is measured alongside so the fixed
     per-call overhead is visible, and the per-direction MB/s are
     reported separately (uplink = bytes_up/t_in, downlink =
     bytes_down/t_out) with their ratio as a symmetry cross-check.
     The link is full duplex, so the ceiling is the slower direction
     alone.  On the hosted tunnel this wire — not host CPU — is what
     bounds the streaming numbers; a production TPU host feeds over
     PCIe (tens of GB/s), so the honest closure is "pipeline rate /
     wire roofline" ≈ 1.0 within the measurement's error, not the
     absolute img/s;
  6. ``pipeline_npy_pagecache_img_per_s`` — the u8 stream reading
     uint8 ``.npy`` files through the serve CLI's cheapest wire
     format.  The small file set is re-read, so after the first pass
     every read hits the OS page cache: this measures npy decode +
     memcpy + engine plumbing (the warm-cache serving steady state),
     NOT cold disk IO (bench_input.py prices the decode at ~0.9
     ms/img — this arm should track the in-memory one);
  7. ``dynbatch_img_per_s`` — the ``--dynamic-batch`` artifact
     (symbolic batch dim, XLA head — ``export_serving(batch=None)``),
     measured at several batch sizes against the fixed-batch artifact
     at its export batch.  This prices the flexibility: one artifact
     for any batch, but no Pallas fast path;
  8. ``quant8_img_per_s``    — the shipped quant8 config (dynamic
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

    # every pure-compute arm syncs on a device-side scalar reduce of the
    # labels (CLAUDE.md benchmark-sync rule): fetching the full (B,H,W)
    # label batch through the hosted tunnel would tax each arm by an
    # amortized tail fetch.  The STREAMING arms below keep fetching —
    # delivered-to-host labels are the thing they measure.
    reduce_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.int32)))

    fn = jax.jit(make_serving_fn(model, fast=on_tpu))
    jit_rate = _measure(lambda a: reduce_fn(fn(variables, a)), x, iters)
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
        art_rate = _measure(lambda a: reduce_fn(served.predict(a)), x,
                            iters)
        print(json.dumps({"metric": "serving_artifact_img_per_s",
                          "value": round(art_rate, 3),
                          "module_mb": round(module_mb, 2),
                          "vs_jit": round(art_rate / jit_rate, 3)}))

        n_stream = batch * 8

        def run_pipeline(predict, preprocess, metric, ratio_to=None):
            engine = ServingEngine(predict, batch, preprocess=preprocess,
                                   workers=2)
            for _ in engine.run((f"w{i}", i) for i in range(batch)):
                pass  # warmup
            t0 = time.perf_counter()
            count = sum(1 for _ in engine.run(
                (f"s{i}", i) for i in range(n_stream)))
            dt = time.perf_counter() - t0
            rate = count / dt
            line = {"metric": metric, "value": round(rate, 3),
                    "images": count}
            if ratio_to:
                line["vs_wire"] = round(rate / ratio_to, 3)
            print(json.dumps(line))
            return rate

        host_pre = lambda i: np.asarray(  # noqa: E731
            data[i % batch], jnp.bfloat16)
        run_pipeline(served.predict, host_pre,
                     "serving_pipeline_host_img_per_s")

        raw = (data * 255).astype(np.uint8)
        fn_u8 = jax.jit(make_serving_fn(model, fast=on_tpu,
                                        normalize_to=jnp.bfloat16))
        u8_rate = run_pipeline(lambda xb: fn_u8(variables, xb),
                               lambda i: raw[i % batch],
                               "serving_pipeline_u8_img_per_s")

        # Transfer roofline of this host<->device link for the u8
        # pipeline's exact traffic: raw uint8 batch up, uint8 label
        # batch down.  The upload leg is DECOMPOSED rather than halved:
        # t_in = (put+get round trip of raw) − (measured download of a
        # resident raw-sized array), so no symmetry assumption enters
        # the number, and the tiny-transfer RTT is measured alongside
        # to expose the fixed per-call overhead.  On the hosted tunnel
        # this wire — not host CPU — bounds the streaming arms above; a
        # production TPU host feeds over PCIe, so report the pipeline
        # as a fraction of the wire ceiling (and read ~1.0 as "at the
        # ceiling within error") rather than pretending the absolute
        # number generalizes.
        def timed(f, reps=6):
            f()  # warmup (first slice fetch may compile a gather)
            t0 = time.perf_counter()
            for _ in range(reps):
                f()
            return (time.perf_counter() - t0) / reps

        labels_dev = fn_u8(variables, jnp.asarray(raw))
        np.asarray(jax.device_get(labels_dev))  # finish compute first
        # device_get caches the host copy on the jax.Array, so repeat
        # fetches of the same array are free; a trivial on-device copy
        # (+0) makes each iteration a fresh transfer.
        copy_fn = jax.jit(lambda a: a + 0)
        raw_dev = jax.device_put(raw)
        t_down_raw = timed(lambda: np.asarray(jax.device_get(
            copy_fn(raw_dev))))
        t_rt = timed(lambda: jax.device_get(jax.device_put(raw)))
        t_in = max(t_rt - t_down_raw, 1e-9)  # upload leg, no symmetry
        tiny = np.zeros(8, np.uint8)
        t_rtt0 = timed(lambda: jax.device_get(jax.device_put(tiny)))
        t_out = timed(lambda: np.asarray(jax.device_get(
            copy_fn(labels_dev))))
        # The link is full duplex, so the steady-state ceiling is set by
        # the slower direction, with uploads overlapping downloads.
        wire_ceiling = batch / max(t_in, t_out)
        label_bytes = int(np.prod(labels_dev.shape)
                          ) * np.dtype(labels_dev.dtype).itemsize
        uplink = raw.nbytes / t_in / 2**20
        downlink_raw = raw.nbytes / t_down_raw / 2**20
        print(json.dumps({
            "metric": "serving_wire_roofline_img_per_s",
            "value": round(wire_ceiling, 3),
            "t_in_ms": round(t_in * 1e3, 1),
            "t_out_ms": round(t_out * 1e3, 1),
            "t_rtt0_ms": round(t_rtt0 * 1e3, 1),
            "serial_wire_img_per_s": round(batch / (t_in + t_out), 3),
            "uplink_mb_per_s": round(uplink, 1),
            "downlink_mb_per_s": round(label_bytes / t_out / 2**20, 1),
            "downlink_raw_mb_per_s": round(downlink_raw, 1),
            "link_symmetry_down_over_up": round(downlink_raw / uplink, 2),
            "pipeline_u8_vs_wire": round(u8_rate / wire_ceiling, 3)}))

        # File input: uint8 .npy files (the serve CLI's cheapest wire
        # format) streamed through the same engine.  The small set is
        # re-read, so after pass one every read is an OS page-cache
        # hit — this is the warm steady state (npy decode + memcpy +
        # engine), NOT cold disk IO.
        npy_dir = os.path.join(tmp, "stream_npy")
        os.makedirs(npy_dir)
        paths = []
        for i in range(batch):
            p = os.path.join(npy_dir, f"s{i}.npy")
            np.save(p, raw[i])
            paths.append(p)
        run_pipeline(lambda xb: fn_u8(variables, xb),
                     lambda i: np.load(paths[i % batch]),
                     "serving_pipeline_npy_pagecache_img_per_s",
                     ratio_to=wire_ceiling)

        # --dynamic-batch artifact: symbolic batch dim, XLA head.  One
        # artifact serves any batch; this prices that flexibility
        # against the fixed-batch Pallas artifact above.
        exported_dyn = export_serving(model, variables, height=h,
                                      width=w, batch=None, fast=False)
        art_dyn = os.path.join(tmp, "artifact_dyn")
        save_artifact(art_dyn, exported_dyn, variables, spec=spec)
        served_dyn = load_artifact(art_dyn)
        for b in ((1, 4, 8) if on_tpu else (1, 2)):
            xb = jnp.asarray(data[:1].repeat(b, axis=0)
                             if b > batch else data[:b], jnp.bfloat16)
            it = max(4, iters // max(1, b // batch))
            dyn_rate = _measure(
                lambda a: reduce_fn(served_dyn.predict(a)), xb, it)
            line = {"metric": "serving_dynbatch_img_per_s",
                    "value": round(dyn_rate, 3), "batch": b}
            if b == batch:
                line["vs_fixed_artifact"] = round(dyn_rate / art_rate, 3)
            print(json.dumps(line))

    # the shipped quant8 config is fully-XLA: the int8 activation
    # layout + any Pallas call's layout constraint measured a 3x
    # whole-model cliff (ops/quant.py).  fast=on_tpu here exercises
    # make_serving_fn's own quant8 guard (it must drop the flag).
    model_q8, _ = _flagship(tiny=not on_tpu, grouped=True,
                            fast_aspp=False, quant8=True)
    fn_q8 = jax.jit(make_serving_fn(model_q8, fast=on_tpu))
    q8_rate = _measure(lambda a: reduce_fn(fn_q8(variables, a)), x, iters)
    print(json.dumps({"metric": "serving_quant8_img_per_s",
                      "value": round(q8_rate, 3),
                      "vs_bf16": round(q8_rate / jit_rate, 3)}))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import retry_reexec  # shared transient-tunnel policy

    retry_reexec(main)
