"""Fused bilinear-upsample + argmax kernel (Pallas TPU).

The serving/eval prediction step upsamples low-res class logits
(B, 129, 257, 19) to the input resolution (1024, 2048) bilinearly and
argmaxes over classes (reference semantics:
`segmentation/eval_valid_multiscale.py:229-231` — interpolate then
argmax, never the reverse).  The XLA forms (``jax.image.resize``, the
dense-matrix einsum of ``ops.resize.resize_bilinear_matrix``)
materialize the full-res fp32 logits — 159 MB/image written, re-read
by the argmax — where the useful output is 2 MB of uint8 labels; the
matrix form measures 2.7 ms/batch-4 on v5e vs this kernel's 1.4 ms
incl. the ~1 ms dispatch floor (benchmarks/README.md).

The kernel keeps everything in VMEM:

- input ships channel-major as one (C*hp, w) fp32 block per image
  (2.5 MB — the whole low-res map fits on chip);
- W-interp runs FIRST as a single MXU matmul per output-column tile:
  (C*hp, w) @ (w, P) — all classes and source rows in one M dimension;
- H-interp + argmax loop over the C classes (static unroll): each
  class is one (H, hp) @ (hp, P) matmul and a running max/argmax
  update, so the (H, P, C) full-res volume is never materialized —
  only the winning value and index planes (2 x H*P) live in VMEM;
- the output tile writes int32 labels straight to HBM: 8 MB/image
  total HBM writes instead of 159 MB fp32 + re-read.

Tie semantics match ``jnp.argmax`` (first max wins) via strict ``>``
updates; values equal the same separable two-matmul composition
bit-for-bit (pinned in tests/test_pallas_upsample.py) and
``resize_bilinear_matrix`` up to fp32 summation order.

``fused_upsample_argmax_sharded`` adds the batch-dim SPMD rule (the
pallas_call is opaque to GSPMD) so data-parallel serving keeps the
kernel — same pattern as ``ops.pallas_aspp.fused_aspp_sharded``.  The
interp matrices are ARGUMENTS of the partitioned fn (replicated):
custom_partitioning rejects closed-over array constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.resize import _bilinear_matrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_cols(height: int, tile_cols: int) -> int:
    """Cap the output-column block so best/idx/t3 (~3 fp32+int32 planes
    of height x tile_cols) stay within a comfortable VMEM budget."""
    if height * tile_cols * 16 > 12 * 2 ** 20:
        return max(128, 12 * 2 ** 20 // (height * 16) // 128 * 128)
    return tile_cols


def _apply(logits: jax.Array, mx: jax.Array, my: jax.Array,
           width: int, tile_cols: int, interpret: bool) -> jax.Array:
    """Core kernel call.  ``mx`` (w, wpad>=width) and ``my``
    (height, hp) carry the interp weights; hp = my.shape[1] is the
    sublane-aligned class-slab height."""
    b, h, w, c = logits.shape
    height, hp = my.shape
    wpad = mx.shape[1]
    ncb = wpad // tile_cols

    x = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    x = x.reshape(b, c * hp, w)             # channel-major slabs

    def kernel(x_ref, mx_ref, my_ref, out_ref):
        xs = x_ref[0]                                    # (C*hp, w)
        t2 = jnp.dot(xs, mx_ref[:],
                     preferred_element_type=jnp.float32)  # (C*hp, P)
        best = None
        idx = None
        for ci in range(c):                 # static unroll over classes
            t3 = jnp.dot(my_ref[:], t2[ci * hp:(ci + 1) * hp, :],
                         preferred_element_type=jnp.float32)  # (H, P)
            if best is None:
                best, idx = t3, jnp.zeros(t3.shape, jnp.int32)
            else:
                take = t3 > best            # strict: first max wins
                best = jnp.where(take, t3, best)
                idx = jnp.where(take, jnp.int32(ci), idx)
        out_ref[0] = idx

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(b, ncb),                      # x re-DMAs only per image
        in_specs=[
            pl.BlockSpec((1, c * hp, w), lambda bi, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_cols), lambda bi, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((height, hp), lambda bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, height, tile_cols),
                               lambda bi, j: (bi, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, height, wpad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, mx, my)
    return out[:, :, :width]


def _matrices(h: int, w: int, height: int, width: int,
              tile_cols: int) -> tuple:
    hp = _round_up(h, 8)
    wpad = _round_up(width, tile_cols)
    my = np.pad(_bilinear_matrix(height, h), ((0, 0), (0, hp - h)))
    mx = np.pad(_bilinear_matrix(width, w).T, ((0, 0), (0, wpad - width)))
    return jnp.asarray(mx), jnp.asarray(my)


def fused_upsample_argmax(logits: jax.Array, height: int, width: int,
                          tile_cols: int = 256,
                          interpret: bool = False) -> jax.Array:
    """(B, h, w, C) logits -> (B, height, width) int32 labels.

    Equals ``argmax(resize_bilinear_matrix(logits, height, width))`` up
    to fp32 summation order (exact vs the same separable two-matmul
    composition).
    """
    b, h, w, c = logits.shape
    tile_cols = _pick_tile_cols(height, tile_cols)
    mx, my = _matrices(h, w, height, width, tile_cols)
    return _apply(logits, mx, my, width, tile_cols, interpret)


@lru_cache(maxsize=16)
def _make_batch_partitioned(width: int, tile_cols: int, interpret: bool):
    """Batch-parallel SPMD rule: each device upsamples its batch shard;
    h/w/C and the interp matrices are per-image structure and must
    replicate (mirrors ``pallas_aspp._make_fused_aspp_batch_partitioned``)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fn(logits, mx, my):
        return _apply(logits, mx, my, width, tile_cols, interpret)

    def _batch_axis(arg_shapes):
        s = arg_shapes[0].sharding
        spec = getattr(s, "spec", None)
        return spec[0] if spec and len(spec) > 0 else None

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes)))

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes)
        return (mesh,
                lambda x, mx, my: _apply(x, mx, my, width, tile_cols,
                                         interpret),
                NamedSharding(mesh, P(axis)),
                (NamedSharding(mesh, P(axis)),
                 NamedSharding(mesh, P()), NamedSharding(mesh, P())))

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="b h w c, w2 p, h2 k -> b h3 w3",
        need_replication_factors=(
            "h", "w", "c", "w2", "p", "h2", "k", "h3", "w3"),
    )
    return fn


def fused_upsample_argmax_sharded(logits: jax.Array, height: int,
                                  width: int, tile_cols: int = 256,
                                  interpret: bool = False) -> jax.Array:
    """``fused_upsample_argmax`` with a batch-dim partitioning rule."""
    b, h, w, c = logits.shape
    tile_cols = _pick_tile_cols(height, tile_cols)
    mx, my = _matrices(h, w, height, width, tile_cols)
    fn = _make_batch_partitioned(width, tile_cols, interpret)
    return fn(logits.astype(jnp.float32), mx, my)
