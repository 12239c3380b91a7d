"""Layer5 training-backward probe: is the 47 TFLOP/s slice dilation's fault?

`bench_backward.py --sections layers` prices the layer5 backward slice
of the cityscapes joint step at ~12 ms / ~47 TFLOP/s while layer4's
equivalent slice runs at ~85.  Layer5 differs in dilation (4 vs 2),
width (2048 vs 1024 out) and depth (3 vs 23 blocks).  This isolates
the layer5 chain (3 bottleneck blocks, frozen BN, input 2x65x65x1024 —
the exact joint-train shape) and times forward and fwd+grads
(conv params + input, BN affine frozen like the joint phase) in four
arms:

  native_d4_xla     dilation-4 chain, XLA autodiff
  native_d4_hybrid  dilation-4 chain, the shipped hybrid gradconv VJP
                    (`ops/gradconv.py`)
  dense_d1_control  SAME chain with dilation 1 — identical FLOPs and
                    layouts, so it isolates the pure dilation penalty
  s2b_d4            space-to-batch: 65x65 zero-padded to 68x68, the
                    4x4 phase grids stacked on batch (32x17x17x1024),
                    chain run dense (d=1), inverse rearrange.  Border
                    math differs from true d=4 (SAME-pad at subgrid
                    edges); perf probe only — exact-interior wiring
                    exists in the round-3 inference experiment and
                    would be reused if this wins.

Reading: if dense_d1 ~= native_d4, dilation isn't the problem and the
slice residue is the chain's elementwise/residual backward (closure);
if dense_d1 is much faster AND s2b captures most of the gap, a
training-only s2b wrap of layer5 is the next recipe knob.

Run on the real TPU chip:  python benchmarks/bench_layer5_s2b.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import traverse_util

    from scaleprotoseg_tpu.models.deeplab import ResLayer
    from scaleprotoseg_tpu.profiling import time_fn_pipelined

    N, H, W, C = 2, 65, 65, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)) * 0.1, jnp.bfloat16)

    def build(dilation: int, fast_grad: bool):
        layer = ResLayer(n_blocks=3, mid=512, out=2048, stride=1,
                         dilation=dilation, dtype=jnp.bfloat16,
                         fast_grad=fast_grad)
        shapes = jax.eval_shape(
            lambda k: layer.init(k, jnp.zeros((1, 17, 17, C),
                                              jnp.bfloat16)),
            jax.random.PRNGKey(0))

        def leaf(path, s):
            del path  # values don't affect timing; keep them small
            return jnp.asarray(
                rng.standard_normal(s.shape) *
                (0.02 if s.shape and len(s.shape) > 1 else 1.0), s.dtype)

        variables = jax.tree_util.tree_map_with_path(leaf, shapes)
        return layer, variables

    B = 4  # s2b block = dilation

    def s2b(x):
        n, h, w, c = x.shape
        hp, wp = -(-h // B) * B, -(-w // B) * B
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        x = x.reshape(n, hp // B, B, wp // B, B, c)
        return x.transpose(2, 4, 0, 1, 3, 5).reshape(
            B * B * n, hp // B, wp // B, c)

    def b2s(y, h, w):
        bb_n, hs, ws, c = y.shape
        n = bb_n // (B * B)
        y = y.reshape(B, B, n, hs, ws, c).transpose(2, 3, 0, 4, 1, 5)
        return y.reshape(n, hs * B, ws * B, c)[:, :h, :w]

    def split_trainable(variables):
        flat = traverse_util.flatten_dict(variables["params"])
        train = {k: v for k, v in flat.items() if "bn" not in k}
        frozen = {k: v for k, v in flat.items() if "bn" in k}
        return (traverse_util.unflatten_dict(train),
                traverse_util.unflatten_dict(frozen))

    def timed(name, fn, *args, flops=None):
        rate = time_fn_pipelined(fn, *args, iters=8)
        rec = {"metric": name, "ms": round(1e3 / rate, 2)}
        if flops is None:
            try:
                cost = jax.jit(fn).lower(*args).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
            except Exception:
                flops = 0.0
        if flops:
            rec["tflops_per_s"] = round(flops * rate / 1e12, 1)
            rec["gflops"] = round(flops / 1e9, 1)
        print(json.dumps(rec), flush=True)

    arms = [("native_d4_xla", 4, False, False),
            ("native_d4_hybrid", 4, True, False),
            ("dense_d1_control", 1, False, False),
            ("s2b_d4", 1, False, True)]

    for name, dilation, fast_grad, use_s2b in arms:
        layer, variables = build(dilation, fast_grad)
        bs = {"batch_stats": variables["batch_stats"]} \
            if "batch_stats" in variables else {}
        trainable, frozen = split_trainable(variables)

        def fwd(trainable_p, xx, layer=layer, frozen=frozen, bs=bs,
                use_s2b=use_s2b):
            params = traverse_util.unflatten_dict(
                {**traverse_util.flatten_dict(trainable_p),
                 **traverse_util.flatten_dict(frozen)})
            v = {"params": params, **bs}
            if use_s2b:
                return b2s(layer.apply(v, s2b(xx)), xx.shape[1],
                           xx.shape[2])
            return layer.apply(v, xx)

        @jax.jit
        def fwd_only(trainable, xx, fwd=fwd):
            return jnp.float32(0) + jnp.sum(
                fwd(trainable, xx).astype(jnp.float32)[:, ::16, ::16, ::64])

        @jax.jit
        def fwd_bwd(trainable, xx, fwd=fwd):
            def loss(tp, xi):
                y = fwd(tp, xi)
                return jnp.vdot(y.astype(jnp.float32), y)[()] * 1e-6

            g_p, g_x = jax.grad(loss, argnums=(0, 1))(trainable, xx)
            return sum(jnp.vdot(l, l) for l in jax.tree.leaves(g_p)) + \
                jnp.vdot(g_x, g_x)

        timed(f"{name}_fwd", fwd_only, trainable, x)
        timed(f"{name}_fwd_bwd", fwd_bwd, trainable, x)


if __name__ == "__main__":
    main()
