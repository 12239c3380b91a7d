"""Headline benchmark: Cityscapes-resolution inference throughput.

Measures images/sec/chip for the flagship grouped ScaleProtoSeg model
(DeepLabv2-ResNet101 concat-ASPP + 4-scale prototype head + group
projection, bf16 compute) on full 1024x2048 inputs — the BASELINE.json
north-star metric.  The reference publishes no throughput numbers
(SURVEY.md §6); ``vs_baseline`` is measured throughput divided by an
estimated single-A100 fp32 reference throughput of 7 img/s — derivation
in BASELINE.md §"A100 baseline derivation"; the 3x target corresponds to
vs_baseline >= 3.

For auditability the line also carries achieved ``tflops_per_s`` (from
XLA's compiled cost analysis of the measured executable — analytic FLOPs,
not a hardware counter) and ``mfu`` vs the chip's dense bf16 peak, so the
headline number can be checked against the roofline instead of only
against the A100 assumption.

The line additionally reports ``quant8_static_img_per_s``: the same
model served through the calibrated-int8 fast path (``quant8='static'``
layer4/5 + fused Pallas ASPP/head — the fastest measured serving
config, `benchmarks/bench_quant_static*.py`).  The headline ``value``
stays bf16: post-training quantization is an accuracy tradeoff the
user opts into, so it rides along rather than defining the metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_IMG_PER_S = 7.0  # see BASELINE.md "A100 baseline derivation"

# Dense bf16/fp16 peak TFLOP/s per chip by device kind (public specs).
_PEAK_TFLOPS = {
    "TPU v2": 45.0,
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,       # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v6 lite": 918.0,       # v6e / Trillium
    "TPU v6e": 918.0,
    "TPU7x": 2307.0,
}


def _peak_tflops(device_kind: str):
    for key, peak in sorted(_PEAK_TFLOPS.items(), key=lambda kv: -len(kv[0])):
        if device_kind.lower().startswith(key.lower()):
            return peak
    return None


def _compiled_flops(forward, variables, x):
    """Analytic FLOPs of one executable call from XLA cost analysis."""
    try:
        cost = forward.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _measure(forward, variables, x, iters: int) -> float:
    """Pipelined steady-state timing.  NOTE: on the hosted 'axon' TPU
    platform block_until_ready returns before execution completes, so a
    device->host fetch of the (tiny) argmax output is the sync point."""
    import jax

    jax.device_get(forward(variables, x))  # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = forward(variables, x)
    jax.device_get(out)
    return x.shape[0] * iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scaleprotoseg_tpu.cli_common import enable_compilation_cache

    # A cold compile of the full-res forward costs minutes through the
    # hosted compile tunnel; the persistent cache makes reruns (and the
    # cost-analysis recompile below) near-instant.
    enable_compilation_cache()

    # fast_aspp: fused one-pass Pallas ASPP (inference-only fast path)
    model, _ = _flagship(tiny=False, grouped=True, fast_aspp=True)
    # Throughput is weight-independent: materialize zero params from the
    # init shape tree (avoids a ~2 min on-device init compile).
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def forward(variables, x):
        logits = model.apply(variables, x, method="fast_logits")
        return jnp.argmax(logits, axis=-1)

    # float32 gen: half the host time of the default float64 on this
    # 1-core host (the values only feed a bf16 cast)
    data = np.random.default_rng(0).random((16, 1024, 2048, 3),
                                           dtype=np.float32)
    best = 0.0
    best_x = None
    for batch in (4, 8, 16):
        x = jnp.asarray(data[:batch], jnp.bfloat16)
        # two passes per shape: the hosted-TPU tunnel throughput varies
        # run-to-run; keep the best steady-state measurement
        for _ in range(2):
            rate = _measure(forward, variables, x, iters=16)
            if rate > best:
                best, best_x = rate, x

    record = {
        "metric": "cityscapes_1024x2048_inference_throughput",
        "value": round(best, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / A100_BASELINE_IMG_PER_S, 3),
    }

    # quant8-static rider: calibrated PTQ int8 layer4/5 + the same fused
    # Pallas fast path, measured at the bf16 winner's batch size.  Any
    # failure here must not cost the headline line.
    try:
        from __graft_entry__ import synthetic_init
        from scaleprotoseg_tpu.model_loading import calibrate_quant_scales

        qmodel, _ = _flagship(tiny=False, grouped=True, fast_aspp=True,
                              quant8="static")
        # calibration reads activation maxima, so it needs non-zero
        # weights (same tree as the bf16 arm; throughput is unaffected)
        qvars = synthetic_init(shapes, seed=0)
        qvars = calibrate_quant_scales(qmodel, qvars, [best_x[:1]])

        @jax.jit
        def qforward(variables, x):
            logits = qmodel.apply(variables, x, method="fast_logits")
            return jnp.argmax(logits, axis=-1)

        qbest = 0.0
        for _ in range(2):
            qbest = max(qbest, _measure(qforward, qvars, best_x, iters=16))
        record["quant8_static_img_per_s"] = round(qbest, 3)
    except Exception as e:  # rider only — keep the bf16 headline alive
        record["quant8_static_error"] = f"{type(e).__name__}: {e}"[:200]
    flops = _compiled_flops(forward, variables, best_x)
    kind = jax.devices()[0].device_kind
    record["device_kind"] = kind
    if flops:
        if jax.default_backend() == "tpu":
            # XLA's cost analysis does not see inside the fused Pallas
            # ASPP custom call (active on TPU only — off-TPU the module
            # falls back to XLA and the FLOPs are already counted); add
            # its analytic FLOPs (9 taps x C -> n_out per rate) so
            # tflops/mfu stay comparable with the pure-XLA build.
            hp, wp = jax.eval_shape(forward, variables, best_x).shape[1:3]
            bb = model.backbone
            c_in = 64 * 2 ** 5  # layer5 output width of the dilated ResNet
            flops += (best_x.shape[0] * hp * wp * 9 * c_in * bb.n_out
                      * len(bb.atrous_rates) * 2)
        per_image = flops / best_x.shape[0]
        tflops_per_s = best * per_image / 1e12
        record["tflops_per_image"] = round(per_image / 1e12, 4)
        record["tflops_per_s"] = round(tflops_per_s, 2)
        peak = _peak_tflops(kind)
        if peak:
            record["mfu"] = round(tflops_per_s / peak, 4)
    print(json.dumps(record))


def _is_transient(exc: Exception) -> bool:
    """Only the hosted-TPU tunnel's transient failures warrant a retry
    (its compile helper occasionally drops a request with HTTP 500);
    real errors — bad config, OOM, assertion — must surface once.
    Matching is deliberately narrow: whole-word network-failure phrases,
    not bare substrings (a shape error mentioning '500' or a
    deterministic ConnectionError from a misconfiguration must not eat
    minutes of retry)."""
    import re
    if isinstance(exc, (ConnectionResetError, ConnectionAbortedError,
                        BrokenPipeError, TimeoutError)):
        return True
    msg = f"{type(exc).__name__}: {exc}".lower()
    return re.search(
        r"http.{0,20}\b500\b|internal server error|\bunavailable\b"
        r"|deadline exceeded|connection (reset|refused|aborted|closed)"
        r"|socket (closed|error)|timed.?out|\btransient\b", msg) is not None


def retry_reexec(fn) -> None:
    """Run ``fn()``; on a transient hosted-tunnel failure, re-exec the
    process (shared by every benchmark entry point).

    Re-exec instead of calling ``fn()`` again: a failed TPU backend
    init is cached by jax.xla_bridge for the process lifetime, so an
    in-process retry would re-raise instantly.  A fresh process
    re-attempts the tunnel from scratch; attempts are bounded via the
    inherited BENCH_RETRY_ATTEMPT env var.  Non-transient errors (bad
    config, OOM, assertion) surface once — see ``_is_transient``.
    """
    try:
        fn()
    except Exception as e:
        if not _is_transient(e):
            raise
        import os
        import sys
        import traceback
        traceback.print_exc()
        attempt = int(os.environ.get("BENCH_RETRY_ATTEMPT", "0"))
        if attempt >= 3:
            raise
        time.sleep(30 * (attempt + 1))
        os.environ["BENCH_RETRY_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    retry_reexec(main)
