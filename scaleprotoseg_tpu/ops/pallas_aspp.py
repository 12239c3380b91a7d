"""One-pass fused ASPP kernel (Pallas TPU).

The concat-ASPP head is the flagship model's HBM-bandwidth hotspot: four
3x3 atrous convs (rates 6/12/18/24, 2048 -> 64 each) over the same
(129, 257, 2048) bf16 feature map (~136 MB).  XLA's best formulation
(the shifted-matmul ASPP in ``models/deeplab.py``) re-reads that map 36
times — once per (rate, tap) — and measures ~8 ms on TPU v5e; the
dilated-conv lowering is ~14.5 ms (benchmarks/microbench.py).

This kernel reads the input once and runs at ~4.9 ms (1.6x XLA) by
keeping ALL data movement on the cheap side of the matmul:

- grid walks (row-tile, channel-chunk); each step DMAs one haloed bf16
  input block HBM -> VMEM, double-buffered so the copy hides behind the
  previous step's compute.  Overlapping (haloed) windows are not
  expressible with BlockSpec tiling, hence the manual async copy.
- ROW taps are free: rows live on the untiled dimension of the VMEM
  block, so the three row offsets per rate are plain slices of the halo.
- COLUMN taps are realigned on the matmul *output*: each (rate, row-tap)
  does ONE bf16 MXU matmul (chunk_c -> 3F, the three column taps packed
  along N), the three row-taps are summed per column tap, and the sum is
  shifted with a single ``pltpu.roll`` over (tile, W, F) fp32 — 32x
  fewer bytes than rolling the 2048-channel input (the V1 kernel did
  the latter, paying an fp32 cast on top because Mosaic cannot roll
  bf16 along the sublane axis, and lost to XLA at ~9.8 ms).
- per-rate fp32 accumulation across channel chunks in VMEM scratch.

Weights: per-rate (3, 3, C, F) kernels; biases per-rate (F,).

``fused_aspp`` is the raw kernel (no VJP).  ``fused_aspp_trainable``
wraps it in a custom VJP whose backward is written directly from the
op's linear structure (the ASPP is linear in x and in W), so training
can use the one-pass kernel for the forward while the backward costs
exactly the XLA shifted-matmul AD graph — with no forward recompute
(``jax.vjp`` of the XLA form would re-run the whole forward inside the
backward; the manual rule avoids that).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_chunk(c: int, chunk_c: int) -> int:
    """Largest divisor of ``c`` that is <= the requested chunk cap (so
    the VMEM budget is never exceeded for awkward channel counts).
    When ``c`` is lane-aligned (multiple of 128) only lane-aligned
    chunks are considered — the kernel's manual HBM->VMEM copy slices
    the channel axis, and Mosaic requires slices along the lane
    dimension to be 128-aligned — so a requested cap below 128 rounds
    up to the 128 minimum."""
    step = 128 if c % 128 == 0 else 1
    for cand in range(max(min(c, chunk_c) // step * step, step), 0,
                      -step):
        if c % cand == 0:
            return cand
    raise AssertionError(c)  # unreachable: step divides c


def fused_aspp(x: jax.Array, weights: Sequence[jax.Array],
               biases: Sequence[jax.Array],
               rates: Tuple[int, ...] = (6, 12, 18, 24),
               tile_rows: int = 8, chunk_c: int = 512,
               interpret: bool = False) -> jax.Array:
    """Concat-ASPP: x (B, H, W, C) -> (B, H, W, len(rates)*F) bf16
    (fp32 accumulation in VMEM scratch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n_rates = len(rates)
    f = weights[0].shape[-1]
    halo = max(rates)
    # Lane alignment: the manual channel-chunk DMA slices the last
    # (lane) axis of the HBM memref, which Mosaic requires to be
    # 128-aligned.  Small-C inputs (e.g. the 64-channel UNet decoder
    # features at the EM config) are zero-padded to 128 along C, with
    # matching zero rows in the weights — exact, the pad contributes 0.
    c_eff = _round_up(c, 128)
    if c_eff != c:
        weights = [jnp.pad(wt, ((0, 0), (0, 0), (0, c_eff - c), (0, 0)))
                   for wt in weights]
    chunk_c = _pick_chunk(c_eff, chunk_c)
    n_chunks = c_eff // chunk_c
    h_pad = _round_up(h, tile_rows)
    n_row_tiles = h_pad // tile_rows
    w8 = _round_up(w + 2 * halo, 8)
    tile_in_rows = tile_rows + 2 * halo
    out_f = n_rates * f

    xp = jnp.pad(x, ((0, 0), (halo, halo + h_pad - h),
                     (halo, w8 - w - halo), (0, c_eff - c)))
    # Wcat[rate, di]: (C, 3F) with the three column taps along N.
    wstack = jnp.stack([
        jnp.stack([jnp.concatenate(
            [weights[ri][di, dj].astype(jnp.bfloat16) for dj in range(3)],
            axis=-1) for di in range(3)])
        for ri in range(n_rates)])  # (R, 3, C, 3F)
    bias = jnp.concatenate([jnp.asarray(bb, jnp.float32) for bb in biases])

    def kernel(x_hbm, w_ref, b_ref, out_ref, acc, xbuf, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        ci = pl.program_id(2)
        nr = pl.num_programs(1)
        nc = pl.num_programs(2)
        li = (bi * nr + i) * nc + ci
        total_steps = pl.num_programs(0) * nr * nc

        def dma_for(li2):
            bi2 = li2 // (nr * nc)
            i2 = (li2 // nc) % nr
            ci2 = li2 % nc
            slot = jax.lax.rem(li2, 2)
            return pltpu.make_async_copy(
                x_hbm.at[bi2, pl.ds(i2 * tile_rows, tile_in_rows), :,
                         pl.ds(ci2 * chunk_c, chunk_c)],
                xbuf.at[slot], sem.at[slot])

        @pl.when(li == 0)
        def _():
            dma_for(0).start()

        @pl.when(li + 1 < total_steps)
        def _():
            dma_for(li + 1).start()

        @pl.when(ci == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        dma_for(li).wait()
        slot = jax.lax.rem(li, 2)
        for ri, rate in enumerate(rates):
            ps = []
            for di in range(3):
                rs = halo + (di - 1) * rate
                rows = xbuf[slot, rs:rs + tile_rows]
                ps.append(jnp.dot(
                    rows.reshape(tile_rows * w8, chunk_c), w_ref[ri, di],
                    preferred_element_type=jnp.float32,
                ).reshape(tile_rows, w8, 3 * f))
            total = None
            for dj in range(3):
                s = (ps[0][:, :, dj * f:(dj + 1) * f]
                     + ps[1][:, :, dj * f:(dj + 1) * f]
                     + ps[2][:, :, dj * f:(dj + 1) * f])
                o = (dj - 1) * rate
                if o:
                    s = pltpu.roll(s, (w8 - o) % w8, 1)
                total = s if total is None else total + s
            acc[:, :, ri * f:(ri + 1) * f] += total

        @pl.when(ci == nc - 1)
        def _():
            out_ref[0] = (acc[:] + b_ref[:]).astype(out_ref.dtype)

    # batch folds into the leading grid dimension: one pallas_call for
    # the whole batch (bit-identical to a per-image loop, avoids the
    # host-level concat of per-image outputs)
    y = pl.pallas_call(
        kernel,
        grid=(b, n_row_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((n_rates, 3, chunk_c, 3 * f),
                         lambda bi, i, j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_f,), lambda bi, i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, w8, out_f),
                               lambda bi, i, j: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w8, out_f),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, w8, out_f), jnp.float32),
            pltpu.VMEM((2, tile_in_rows, w8, chunk_c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wstack, bias)
    return y[:, :h, halo:halo + w]


@lru_cache(maxsize=16)
def _make_fused_aspp_batch_partitioned(rates: Tuple[int, ...],
                                       tile_rows: int, chunk_c: int,
                                       interpret: bool):
    """GSPMD-aware wrapper: the pallas_call is an opaque custom call, so
    without a rule the partitioner replicates the 2048-channel input
    around it on multi-device meshes (the round-2 multi-chip eval
    fallback).  This declares the op batch-parallel — each device runs
    the kernel on its batch shard; H/W/C and the weights stay replicated
    (the halo makes spatial sharding a different design, handled by
    parallel.mesh's spatial path with the XLA form)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fa(x, wstack, bstack):
        ws = [wstack[i] for i in range(len(rates))]
        bs = [bstack[i] for i in range(len(rates))]
        return fused_aspp(x, ws, bs, rates=rates, tile_rows=tile_rows,
                          chunk_c=chunk_c, interpret=interpret)

    def _batch_axis(arg_shapes):
        s = arg_shapes[0].sharding
        spec = getattr(s, "spec", None)
        return spec[0] if spec and len(spec) > 0 else None

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes)))

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes)
        arg_shardings = (NamedSharding(mesh, P(axis)),
                         NamedSharding(mesh, P()),
                         NamedSharding(mesh, P()))
        result_sharding = NamedSharding(mesh, P(axis))

        def lower_fn(x, wstack, bstack):
            ws = [wstack[i] for i in range(len(rates))]
            bs = [bstack[i] for i in range(len(rates))]
            return fused_aspp(x, ws, bs, rates=rates,
                              tile_rows=tile_rows, chunk_c=chunk_c,
                              interpret=interpret)

        return mesh, lower_fn, result_sharding, arg_shardings

    fa.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        # Shardy rule: only the batch factor b is shardable; everything
        # else must be replicated (halo reads span H/W; C is contracted)
        sharding_rule="b h w c, r k l c2 f, r2 f2 -> b h2 w2 f3",
        need_replication_factors=(
            "h", "w", "c", "r", "k", "l", "c2", "f", "r2", "f2",
            "h2", "w2", "f3"),
    )
    return fa


def fused_aspp_sharded(x: jax.Array, weights: Sequence[jax.Array],
                       biases: Sequence[jax.Array],
                       rates: Tuple[int, ...] = (6, 12, 18, 24),
                       tile_rows: int = 8, chunk_c: int = 512,
                       interpret: bool = False) -> jax.Array:
    """``fused_aspp`` with a batch-dim SPMD partitioning rule (no VJP)."""
    fn = _make_fused_aspp_batch_partitioned(tuple(rates), tile_rows,
                                            chunk_c, interpret)
    return fn(x, jnp.stack([jnp.asarray(w) for w in weights]),
              jnp.stack([jnp.asarray(b) for b in biases]))


# Forward-form crossover: the one-pass kernel wins where the input is
# channel-deep and spatially small (flagship OS-8: C=2048 at 129x257 —
# 4.9 vs 8 ms XLA); it LOSES where the input is shallow and full-res
# (EM: C=64 at 512^2 — the halo makes each 8-row tile read 56 rows, a
# 7x re-read, and C pads to the 128-lane tiling, wasting half the MXU).
# Below this channel count the trainable wrapper uses the XLA
# shifted-matmul forward instead — SAME math, same packed backward.
_KERNEL_MIN_C = 512


def _xla_shifted_aspp(x, weights, biases, rates):
    """Reference shifted-matmul ASPP forward (the ASPP module's XLA
    form, models/deeplab.py): nine pointwise matmuls per rate off one
    shared padded tensor.  bf16 output to match the kernel's
    contract."""
    m = max(rates)
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)))
    outs = []
    for ri, rate in enumerate(rates):
        acc = None
        wt = weights[ri]
        for di in range(3):
            for dj in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, m + (di - 1) * rate, m + (dj - 1) * rate, 0),
                    (b, h, w, c))
                t = jnp.einsum("bhwc,cf->bhwf", xs,
                               wt[di, dj].astype(x.dtype),
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        outs.append(acc + jnp.asarray(biases[ri], jnp.float32))
    return jnp.concatenate(outs, -1).astype(jnp.bfloat16)


@lru_cache(maxsize=16)
def _make_fused_aspp_trainable(rates: Tuple[int, ...], tile_rows: int,
                               chunk_c: int, interpret: bool):
    n_rates = len(rates)
    halo = max(rates)

    @jax.custom_vjp
    def f(x, weights, biases):
        if x.shape[-1] >= _KERNEL_MIN_C:
            return fused_aspp_sharded(x, list(weights), list(biases),
                                      rates=rates, tile_rows=tile_rows,
                                      chunk_c=chunk_c, interpret=interpret)
        return _xla_shifted_aspp(x, list(weights), list(biases), rates)

    def fwd(x, weights, biases):
        return f(x, weights, biases), (x, weights)

    def bwd(res, g):
        """Manual transpose of the shifted-matmul ASPP, tap-packed.

        Forward per rate r, taps (di, dj):
          y_r[p] += x[p + off] @ W_r[di, dj],  off = ((di-1)r, (dj-1)r)
        so (substituting q = p + off; both reductions consume the SAME
        shifted-gradient family G[q, (r,di,dj,f)] := g_r[q - off]):
          dx[q, c]         = sum_k G[q, k] W_all[k, c]
          dW_all[c, k]     = sum_q x[q, c] G[q, k]
          db_r             = sum_p g_r[p]

        Why packed: the tap-by-tap form is 36 K=64 einsums for dx (each
        writing a full fp32 dx-sized intermediate into the 35-add chain)
        plus 36 re-reads of the 2048-wide x for dW — measured ~5 ms of
        pure HBM traffic inside the train step, mis-attributed to the
        layer5 backward until `bench_backward.py --sections layers`
        localized it (the dx path is dead code unless the backbone
        below is trainable).  Building G once (g-side shifts: 64-wide,
        32x fewer bytes than shifting x) turns both reductions into ONE
        MXU-shaped matmul each (K = n_rates*9*f), reading x exactly
        once.  Exact contraction re-ordering — same operands, fp32
        accumulation (`preferred_element_type`), parity pinned by
        `test_fused_aspp_trainable_vjp_matches_xla_ad`.
        """
        x, weights = res
        b_, h_, w_, c_ = x.shape
        f_ = weights[0].shape[-1]
        cdt = x.dtype  # matmuls follow the input dtype (bf16 on TPU)
        gc = g.astype(cdt)
        xb = x.astype(cdt)
        gp = jnp.pad(gc, ((0, 0), (halo, halo), (halo, halo), (0, 0)))

        slices = []
        for ri, rate in enumerate(rates):
            g_r_pad = gp[..., ri * f_:(ri + 1) * f_]
            for di in range(3):
                for dj in range(3):
                    oy, ox = (di - 1) * rate, (dj - 1) * rate
                    slices.append(jax.lax.dynamic_slice(
                        g_r_pad, (0, halo - oy, halo - ox, 0),
                        (b_, h_, w_, f_)))
        G = jnp.concatenate(slices, axis=-1)    # (b,h,w, n_rates*9*f)

        # W_all[(r,di,dj,f), c] = W_r[di,dj][c,f]^T, k-order matching G
        W_all = jnp.concatenate(
            [w.astype(cdt).transpose(0, 1, 3, 2).reshape(9 * f_, c_)
             for w in weights], axis=0)
        dx = jnp.einsum("bhwk,kc->bhwc", G, W_all,
                        preferred_element_type=jnp.float32).astype(x.dtype)

        dW_all = jnp.einsum("bhwc,bhwk->ck", xb, G,
                            preferred_element_type=jnp.float32)
        dW_all = dW_all.reshape(c_, n_rates, 3, 3, f_)
        dws = tuple(dW_all[:, ri].transpose(1, 2, 0, 3)
                    .astype(weights[ri].dtype) for ri in range(n_rates))
        dbs = tuple(jnp.sum(
            g.astype(jnp.float32)[..., ri * f_:(ri + 1) * f_],
            axis=(0, 1, 2)) for ri in range(n_rates))
        return dx, dws, dbs

    f.defvjp(fwd, bwd)
    return f


def fused_aspp_trainable(x: jax.Array, weights: Sequence[jax.Array],
                         biases: Sequence[jax.Array],
                         rates: Tuple[int, ...] = (6, 12, 18, 24),
                         tile_rows: int = 8, chunk_c: int = 512,
                         interpret: bool = False) -> jax.Array:
    """``fused_aspp`` with a custom VJP (see module docstring)."""
    fn = _make_fused_aspp_trainable(tuple(rates), tile_rows, chunk_c,
                                    interpret)
    return fn(x, tuple(weights), tuple(biases))
