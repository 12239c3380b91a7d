"""One-pass fused ASPP kernel (Pallas TPU).

The concat-ASPP head is the flagship model's HBM-bandwidth hotspot: four
3x3 atrous convs (rates 6/12/18/24, 2048 -> 64 each) each re-read the
entire (129, 257, 2048) bf16 feature map (~136 MB), and XLA executes
them as four separate bandwidth-bound convolutions (~14.5 ms measured on
v5e; see benchmarks/microbench.py).

This kernel reads the input once: the grid walks (row-tile, channel
chunk) steps; each step DMAs one haloed input block HBM -> VMEM (halo =
max rate, so every branch's taps are resident), computes all four
branches' nine taps as MXU matmuls out of VMEM, and accumulates the
concatenated (R, W, 4*F) output in fp32 scratch across channel chunks.
Overlapping (haloed) windows are not expressible with BlockSpec tiling,
hence the manual async copy.

Weights: per-rate (3, 3, C, F) kernels; biases per-rate (F,).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_aspp(x: jax.Array, weights: Sequence[jax.Array],
               biases: Sequence[jax.Array],
               rates: Tuple[int, ...] = (6, 12, 18, 24),
               tile_rows: int = 16, chunk_c: int = 128,
               interpret: bool = False) -> jax.Array:
    """Concat-ASPP: x (B, H, W, C) -> (B, H, W, len(rates)*F) bf16\n    (fp32 accumulation in VMEM scratch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n_rates = len(rates)
    f = weights[0].shape[-1]
    halo = max(rates)
    assert c % chunk_c == 0, (c, chunk_c)
    n_chunks = c // chunk_c
    h_pad = _round_up(h, tile_rows)
    n_row_tiles = h_pad // tile_rows
    # Width lives on the sublane axis: VMEM slicing there must be
    # 8-aligned, so column taps are applied with pltpu.roll on the full
    # (8-aligned) padded width and the halo region is discarded at the end.
    w8 = _round_up(w + 2 * halo, 8)
    tile_in_rows = tile_rows + 2 * halo
    out_f = n_rates * f

    xp = jnp.pad(x, ((0, 0), (halo, halo + h_pad - h),
                     (halo, w8 - w - halo), (0, 0)))

    wstack = jnp.stack([wgt.astype(jnp.bfloat16) for wgt in weights])
    bias = jnp.concatenate([jnp.asarray(bb, jnp.float32)
                            for bb in biases])

    def kernel(x_hbm, w_ref, b_ref, out_ref, acc, xbuf, sem):
        i = pl.program_id(0)
        ci = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * tile_rows, tile_in_rows), :,
                     pl.ds(ci * chunk_c, chunk_c)],
            xbuf, sem)
        dma.start()

        @pl.when(ci == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        dma.wait()
        # NOTE: Mosaic cannot roll bf16 along the sublane axis (compile
        # crash); cast to fp32 first.
        xt = xbuf[:].astype(jnp.float32)   # (tile_in_rows, w8, chunk_c)
        for ri, rate in enumerate(rates):
            for di in range(3):
                rs = halo + (di - 1) * rate      # row offset: untiled dim
                rows = xt[rs:rs + tile_rows]
                for dj in range(3):
                    cs = halo + (dj - 1) * rate  # col shift via roll
                    xs = pltpu.roll(rows, (w8 - cs) % w8, 1)
                    wk = w_ref[ri, di, dj]       # (chunk_c, F)
                    acc[:, :, ri * f:(ri + 1) * f] += jnp.dot(
                        xs.reshape(tile_rows * w8, chunk_c), wk,
                        preferred_element_type=jnp.float32,
                    ).reshape(tile_rows, w8, f)

        @pl.when(ci == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = (acc[:] + b_ref[:]).astype(out_ref.dtype)

    grid = (n_row_tiles, n_chunks)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
            pl.BlockSpec((n_rates, 3, 3, chunk_c, f),
                         lambda i, j: (0, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_f,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, w8, out_f),
                               lambda i, j: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h_pad, w8, out_f),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, w8, out_f), jnp.float32),
            pltpu.VMEM((tile_in_rows, w8, chunk_c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )
    results = [call(xp[i:i + 1], wstack, bias) for i in range(b)]
    y = jnp.concatenate(results, axis=0) if b > 1 else results[0]
    return y[:, :h, :w]
