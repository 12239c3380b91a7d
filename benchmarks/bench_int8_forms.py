"""Which int8 conv FORM reaches the MXU's 2x peak? (same-run A/B)

bench_int8_mosaic.py settled that Mosaic-emitted int8 matmuls beat bf16
by ~1.5x and a 9-tap Pallas-matmul dilated conv beats the bf16 XLA conv
by 1.8-2.1x.  Before shipping a Pallas serving conv, this asks the
cheaper question: is the win from PALLAS, or from avoiding XLA's s8
*conv* lowering?  If XLA's s8 dot_general is just as fast, the
production int8 path is 9 shifted XLA dots — no custom call, and no
exposure to the measured 3x relayout cliff that Pallas custom calls
trigger next to int8 convs (ops/quant.py docstring).

Arms (identical serving shapes, one process, interleaved):
  bf16_conv      XLA dilated conv, bf16 (the serving baseline)
  s8_conv        XLA dilated conv, int8 operands (the current quant8)
  s8_dot9        9 shifted XLA dot_generals, int8 -> int32
  s8_pallas9     9 shifted Pallas matmuls, int8 -> int32

Serving shapes: OS-8 grid of 1024x2048 inference = (B, 129, 257, C).
Run on the real TPU chip:  python benchmarks/bench_int8_forms.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from benchmarks.bench_int8_mosaic import pallas_mm
    from scaleprotoseg_tpu.profiling import time_fn_pipelined

    rng = np.random.default_rng(0)
    CHAIN = 8

    def conv(x, w, d, prefer=None):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=prefer)

    def taps_dot(x, wk, d, mm):
        b, h, w_, cin = x.shape
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        acc = None
        for ky in range(3):
            for kx in range(3):
                xs = lax.dynamic_slice(xp, (0, ky * d, kx * d, 0),
                                       (b, h, w_, cin))
                t = mm(xs.reshape(-1, cin), wk[ky, kx])
                acc = t if acc is None else acc + t
        return acc.reshape(b, h, w_, wk.shape[-1])

    for name, b, h, w_, c, d in (("layer4_serve", 4, 129, 257, 256, 2),
                                 ("layer5_serve", 4, 129, 257, 512, 4)):
        # pallas_mm grids over M-tiles of 1024: pad the pixel count up
        m_pix = b * h * w_
        gflop = 2 * m_pix * 9 * c * c / 1e9

        xb = jnp.asarray(rng.standard_normal((b, h, w_, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02,
                         jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, (b, h, w_, c)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)

        def requant(y):          # int32 -> int8 feedback, cheap + fused
            return (y >> 8).astype(jnp.int8)

        def chain_bf16_conv(x, wk):
            for _ in range(CHAIN):
                x = conv(x, wk, d)
            return x

        def chain_s8_conv(x, wk):
            for _ in range(CHAIN):
                x = requant(conv(x, wk, d, prefer=jnp.int32))
            return x

        def mm_xla(a, bm):
            return lax.dot_general(a, bm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

        def chain_s8_dot9(x, wk):
            for _ in range(CHAIN):
                x = requant(taps_dot(x, wk, d, mm_xla))
            return x

        def mm_pl(a, bm):
            m, k = a.shape
            pad = -m % 1024
            ap = jnp.pad(a, ((0, pad), (0, 0)))
            return pallas_mm(ap, bm, jnp.int32)[:m]

        def chain_s8_pallas9(x, wk):
            for _ in range(CHAIN):
                x = requant(taps_dot(x, wk, d, mm_pl))
            return x

        for tag, fn, args in (("bf16_conv", chain_bf16_conv, (xb, wb)),
                              ("s8_conv", chain_s8_conv, (x8, w8)),
                              ("s8_dot9", chain_s8_dot9, (x8, w8)),
                              ("s8_pallas9", chain_s8_pallas9, (x8, w8))):
            # scalar on-device reduce: syncing on the raw chain output
            # would fetch 34-68 MB through the tunnel AND favor the
            # int8 arms (half the wire bytes of bf16)
            g = jax.jit(lambda *a, f=fn: jnp.sum(f(*a).astype(
                jnp.float32)))
            rate = time_fn_pipelined(g, *args, iters=8) * CHAIN
            print(json.dumps({
                "metric": f"{name}_{tag}", "ms": round(1e3 / rate, 3),
                "tflops_per_s": round(gflop * rate / 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
