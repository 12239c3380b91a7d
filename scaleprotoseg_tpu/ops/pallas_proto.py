"""Fused multi-scale prototype head as a single Pallas TPU kernel.

BASELINE.json north star: "the prototype layer's L2 similarity maps
(||x||^2 - 2 x.p + ||p||^2 expressed as a 1x1 conv) fuse with
log-activation and the multi-scale group-softmax aggregation into a
single Pallas kernel".

Key algebraic trick making the whole multi-scale head MXU-shaped: pack
the per-scale prototype bank into one block-diagonal matrix
``Pd (P, S*D)`` where row p carries its D-vector in its scale's channel
block and zeros elsewhere.  Then for post-sigmoid features ``x (N, S*D)``:

    cross[n, p] = (x @ Pd^T)[n, p]      == x_s(n) . p      (other blocks 0)
    xn[n, p]    = (x^2 @ M^T)[n, p]     == ||x_s(n)||^2    (M = block mask)
    d           = relu(xn - 2*cross + ||p||^2)
    act         = log((d + 1) / (d + eps))
    logits      = act @ W               (plain head), or
    group       = exp(act @ Wg_dense);  logits = group @ Wlg   (group head)

so the entire head is 3-4 matmuls + elementwise, fused in VMEM with no
HBM round-trip for the (N, P) distance/activation tensors (the XLA
reference path in ``ops.prototype`` materializes both).  Padded
prototype/group columns are neutralized by zero rows in the downstream
weights (exp(0) * 0 = 0).

All matmul operands are padded to lane multiples (128); the pixel grid is
tiled over flattened N = B*H*W.  fp32 throughout the distance/log math
(bf16 features are upcast on load) — eps=1e-4 is sub-bf16-resolution.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.prototype import EPSILON
from scaleprotoseg_tpu.spec import ProtoSpec


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_prototype_bank(prototypes: jax.Array, spec: ProtoSpec,
                        pad_p: Optional[int] = None
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(Pd^T (S*D, Pp), M^T (S*D, Pp), pn (1, Pp)) packed operands."""
    P, D = spec.num_prototypes, spec.proto_depth
    Cf = spec.feature_depth
    Pp = pad_p or _round_up(P, 128)
    scale_ids = np.asarray(spec.scale_ids)

    block = np.zeros((Cf, Pp), np.float32)      # mask M^T
    for p in range(P):
        s = scale_ids[p]
        block[s * D:(s + 1) * D, p] = 1.0
    mt = jnp.asarray(block)

    # scatter each prototype's D-vector into its scale block
    col_idx = jnp.arange(P)
    row_base = jnp.asarray(scale_ids.astype(np.int32)) * D
    d_idx = jnp.arange(D)
    pdT = jnp.zeros((Cf, Pp), jnp.float32)
    pdT = pdT.at[row_base[None, :] + d_idx[:, None], col_idx[None, :]].set(
        prototypes.astype(jnp.float32).T)
    pn = jnp.sum(prototypes.astype(jnp.float32) ** 2, axis=-1)
    pn = jnp.zeros((Pp,), jnp.float32).at[:P].set(pn).reshape(1, Pp)
    return pdT, mt, pn


def _plain_kernel(eps, x_ref, pdt_ref, mt_ref, pn_ref, w_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    cross = jnp.dot(x, pdt_ref[:], preferred_element_type=jnp.float32)
    xn = jnp.dot(x * x, mt_ref[:], preferred_element_type=jnp.float32)
    d = jnp.maximum(xn - 2.0 * cross + pn_ref[:], 0.0)
    act = jnp.log((d + 1.0) / (d + eps))
    out_ref[:] = jnp.dot(act, w_ref[:],
                         preferred_element_type=jnp.float32)


def _group_kernel(eps, x_ref, pdt_ref, mt_ref, pn_ref, gw_ref, glw_ref,
                  out_ref):
    x = x_ref[:].astype(jnp.float32)
    cross = jnp.dot(x, pdt_ref[:], preferred_element_type=jnp.float32)
    xn = jnp.dot(x * x, mt_ref[:], preferred_element_type=jnp.float32)
    d = jnp.maximum(xn - 2.0 * cross + pn_ref[:], 0.0)
    act = jnp.log((d + 1.0) / (d + eps))
    scores = jnp.dot(act, gw_ref[:], preferred_element_type=jnp.float32)
    group = jnp.exp(scores)
    out_ref[:] = jnp.dot(group, glw_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("spec", "interpret", "tile_n"))
def fused_proto_logits(features: jax.Array, prototypes: jax.Array,
                       last_layer: jax.Array, spec: ProtoSpec,
                       group_projection: Optional[jax.Array] = None,
                       last_layer_group: Optional[jax.Array] = None,
                       interpret: bool = False,
                       tile_n: int = 1024) -> jax.Array:
    """Fused head: (B, H, W, S*D) post-add-on features -> (B, H, W, C).

    For the plain head pass ``last_layer`` (P, C); for the grouped head
    pass ``group_projection`` (C, G, Pc_max) and ``last_layer_group``
    (C*G, C) — they are densified/padded here (cheap, jit-cached).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cf = features.shape
    assert cf == spec.feature_depth
    P = spec.num_prototypes
    C = spec.num_classes
    Pp = _round_up(P, 128)
    Cp = _round_up(C, 128)

    pdT, mt, pn = pack_prototype_bank(prototypes, spec, pad_p=Pp)

    n = b * h * w
    n_pad = _round_up(n, tile_n)
    x = features.reshape(n, cf)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    grouped = group_projection is not None
    if grouped:
        g = spec.num_groups
        CGp = _round_up(C * g, 128)
        # densify (C, G, Pc) -> (Pp, CGp): column c*g+k takes class c's
        # group-k weights at that class's prototype rows.
        idx = np.asarray(spec.class_proto_index)          # (C, Pc)
        gw_dense = jnp.zeros((Pp, CGp), jnp.float32)
        rows = jnp.asarray(np.maximum(idx, 0))            # (C, Pc)
        mask = jnp.asarray(spec.class_proto_mask)         # (C, Pc)
        cols = (jnp.arange(C) * g)[:, None, None] + \
            jnp.arange(g)[None, :, None]                  # (C, G, 1)
        gw = group_projection.astype(jnp.float32) * mask[:, None, :]
        gw_dense = gw_dense.at[
            rows[:, None, :], cols].add(gw)               # scatter-add
        # Zero the group-last-layer rows of empty classes so their
        # exp(0)=1 group activations contribute nothing (mirrors the
        # reference's packed concat omitting them).
        has = jnp.asarray(
            (spec.group_class_identity.sum(axis=1) > 0).astype(np.float32))
        glw = jnp.zeros((CGp, Cp), jnp.float32)
        glw = glw.at[:C * g, :C].set(
            last_layer_group.astype(jnp.float32) * has[:, None])
        kernel = functools.partial(_group_kernel, EPSILON)
        weight_args = (gw_dense, glw)
        weight_specs = [
            pl.BlockSpec((Pp, CGp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CGp, Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        # Only scale-covered prototypes reach the logits; zero rows for
        # floor-division-leftover bank rows (spec.num_active_prototypes)
        # neutralize their kernel columns, matching the XLA path's slice.
        A = spec.num_active_prototypes
        wpad = jnp.zeros((Pp, Cp), jnp.float32)
        wpad = wpad.at[:A, :C].set(last_layer[:A].astype(jnp.float32))
        kernel = functools.partial(_plain_kernel, EPSILON)
        weight_args = (wpad,)
        weight_specs = [pl.BlockSpec((Pp, Cp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cf, Pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cf, Pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((tile_n, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, Cp), jnp.float32),
        interpret=interpret,
    )(x, pdT, mt, pn, *weight_args)

    return out[:n, :C].reshape(b, h, w, C)
