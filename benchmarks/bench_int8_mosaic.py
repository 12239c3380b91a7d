"""Mosaic int8 microbench: can quant8 EVER be a speed win on v5e?

Round-3 measured XLA's s8 conv lowering at ~1.05x bf16 — the 2x int8
MXU peak (394.5 TOPS vs 197 TFLOPS) stays on the table at the XLA
level (repo README, int8 section).  This settles the question one
level down, at the Mosaic level (VERDICT r3 next-round #7):

  stage 1  raw Pallas matmul rate, int8 x int8 -> int32 vs
           bf16 x bf16 -> fp32, identical tiling, at the layer5
           conv-tap shape (M = B*H*W pixels, K = N = C = 512).
           This isolates what the MXU + Mosaic will actually emit.
  stage 2  ONLY if stage 1 shows >= 1.5x: a 9-tap shifted-matmul
           int8 dilated 3x3 conv kernel (the ops/gradconv.py taps,
           int8 operands, int32 MXU accumulation, one fused
           dequantize at the end) vs the XLA bf16 dilated conv.

Verdict is written as a go/no-go line; `ops/quant.py` carries the
conclusion either way.

Run on the real TPU chip:  python benchmarks/bench_int8_mosaic.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

M, K = 8192, 512          # layer5 tap: B*H*W=8450 pixels, C=512
TM = 1024                 # rows per grid step


def pallas_mm(a, b, out_dtype):
    """Tiled (M,K)@(K,N) with one grid axis over M-tiles."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = a.shape
    n = b.shape[1]

    def kernel(a_ref, b_ref, o_ref):
        import jax.numpy as jnp
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=out_dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // TM,),
        in_specs=[
            pl.BlockSpec((TM, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(a, b)


def int8_dilated_conv(x, wk, d, scale):
    """9-tap shifted-matmul dilated 3x3 conv, int8 operands, int32
    accumulation, one dequantize at the end (stage 2)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, h, w_, cin = x.shape
    cout = wk.shape[-1]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    xf = None
    for ky in range(3):
        for kx in range(3):
            xs = lax.dynamic_slice(xp, (0, ky * d, kx * d, 0),
                                   (b, h, w_, cin))
            t = pallas_mm(xs.reshape(-1, cin), wk[ky, kx], jnp.int32)
            xf = t if xf is None else xf + t
    return (xf.astype(jnp.float32) * scale).reshape(b, h, w_, cout)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu.profiling import time_fn_pipelined

    rng = np.random.default_rng(0)
    CHAIN = 16
    gflop_mm = 2 * M * K * K / 1e9

    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, K)), jnp.int8)
    a16 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((K, K)) * 0.03, jnp.bfloat16)

    # stage 1: dependent chains (cast output back to the input dtype so
    # each matmul feeds the next; the casts are symmetric across arms)
    def chain8(a, b):
        for _ in range(CHAIN):
            o = pallas_mm(a, b, jnp.int32)
            a = (o >> 8).astype(jnp.int8)
        return a

    def chain16(a, b):
        for _ in range(CHAIN):
            o = pallas_mm(a, b, jnp.float32)
            a = (o * 0.03).astype(jnp.bfloat16)
        return a

    def chain16_xla(a, b):
        for _ in range(CHAIN):
            o = jnp.dot(a, b, preferred_element_type=jnp.float32)
            a = (o * 0.03).astype(jnp.bfloat16)
        return a

    rates = {}
    for tag, fn, args in (("mosaic_int8", chain8, (a8, b8)),
                          ("mosaic_bf16", chain16, (a16, b16)),
                          ("xla_bf16", chain16_xla, (a16, b16))):
        # scalar reduce before sync: raw outputs differ in wire bytes
        # (int8 vs bf16) and would skew the tunnel-fetch overhead
        g = jax.jit(lambda *a, f=fn: jnp.sum(f(*a).astype(jnp.float32)))
        r = time_fn_pipelined(g, *args, iters=10) * CHAIN
        rates[tag] = r
        print(json.dumps({
            "metric": f"mm_{tag}", "ms": round(1e3 / r, 3),
            "tflops_per_s": round(gflop_mm * r / 1e3, 1),
            "shape": [M, K, K],
        }), flush=True)

    speedup = rates["mosaic_int8"] / rates["mosaic_bf16"]
    go = speedup >= 1.5
    print(json.dumps({"metric": "int8_vs_bf16_mosaic",
                      "speedup": round(speedup, 3),
                      "go_conv_kernel": bool(go)}), flush=True)

    if not go:
        print(json.dumps({
            "verdict": "no-go",
            "note": "Mosaic int8 matmul < 1.5x bf16 at conv-tap shapes;"
                    " quant8 stays a memory knob (ops/quant.py)."}),
            flush=True)
        return

    # stage 2: full dilated conv, int8 9-tap kernel vs XLA bf16 conv
    from benchmarks.bench_gradconv import conv
    for name, b, h, w_, c, d in (("layer4", 2, 65, 65, 256, 2),
                                 ("layer5", 2, 65, 65, 512, 4)):
        x8 = jnp.asarray(rng.integers(-127, 128, (b, h, w_, c)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
        xb = jnp.asarray(rng.standard_normal((b, h, w_, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.01,
                         jnp.bfloat16)
        gflop = 2 * b * h * w_ * 9 * c * c / 1e9

        def chain_i8(x, wk):
            for _ in range(8):
                y = int8_dilated_conv(x, wk, d, 1e-4)
                x = jnp.clip(y * 64.0, -127, 127).astype(jnp.int8)
            return x

        def chain_bf(x, wk):
            for _ in range(8):
                x = conv(x, wk, d).astype(jnp.bfloat16)
            return x

        g8 = jax.jit(lambda a, b: jnp.sum(chain_i8(a, b).astype(
            jnp.float32)))
        gb = jax.jit(lambda a, b: jnp.sum(chain_bf(a, b).astype(
            jnp.float32)))
        r8 = time_fn_pipelined(g8, x8, w8, iters=10) * 8
        rb = time_fn_pipelined(gb, xb, wb, iters=10) * 8
        print(json.dumps({
            "metric": f"{name}_conv_int8_vs_bf16",
            "int8_ms": round(1e3 / r8, 3), "bf16_ms": round(1e3 / rb, 3),
            "int8_tflops_per_s": round(gflop * r8 / 1e3, 1),
            "speedup": round(r8 / rb, 3), "dilation": d,
        }), flush=True)


if __name__ == "__main__":
    main()
