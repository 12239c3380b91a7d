"""Prototype-distance ops (XLA reference implementation).

The reference computes L2 distances between pixel embeddings and the
prototype bank as a 1x1 convolution trick
(`model_multiscale.py:256-317`): ``d = ||x||^2 - 2 x.p + ||p||^2`` per
scale, ReLU-clamped, followed by the log activation
``log((d + 1)/(d + eps))`` (`model_multiscale.py:324-330`).

TPU-native formulation: activations are NHWC, the cross term is a plain
(B*H*W, D) x (D, P_s) matmul per scale (MXU-friendly; batched over scales
via one einsum in the regular case).  The distance/log pipeline stays in
fp32 — the log activation's eps=1e-4 is below bf16 resolution near d=0
(SURVEY.md §7 risks).

A fused Pallas kernel for the full distances->activation->head pipeline
lives in ``scaleprotoseg_tpu.ops.pallas_proto``; this module is the
always-correct XLA path and the golden reference for it.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-4  # ref model_multiscale.py:106 (self.epsilon)


# ---------------------------------------------------------------------------
# bf16 block-diagonal matmul form (the TPU recipe path)
# ---------------------------------------------------------------------------
# The reshape form below ((B,H,W,S,D) x (S,P,D) einsums) is correct but
# layout-hostile on TPU: the rank-5 tensors force XLA into
# {2,4,1,0,3}-style layouts, and the r5 EM trace showed the resulting
# relayout copies + fp32 full-res gradient tensors costing ~15 ms of a
# 92 ms step (f32[2,512,512,256] / f32[2,512,512,4,64] copies at
# ~650 GB/s).  Embedding the per-scale structure in a BLOCK-DIAGONAL
# (S*D, P) prototype matrix turns the whole head into two plain rank-2
# matmuls over the natural NHWC layout:
#
#   dist[p] = relu( ((x*x) @ M_cs) @ O_sp  - 2 x @ W + ||p||^2 )
#     W[c, p]  = p_vec[p, c - s_p*D] if c in scale-block of p else 0
#     M_cs, O_sp = channel->scale / scale->prototype 0/1 masks (the
#     ||x||^2 term is per-scale, so it routes through two tiny matmuls
#     rather than a second full (C,P) contraction — see _blockdiag_mats)
#
# (zero blocks contribute nothing, so the math is the per-scale L2
# exactly).  The custom VJP keeps the full-resolution backward in bf16
# (dx via two transposed matmuls; prototype grads accumulate fp32) —
# without it, AD promotes the (B,H,W,C) feature gradient to fp32
# because the distance output/cotangent is fp32.  Handles irregular
# (post-prune) banks too: blocks just have unequal widths.


def _blockdiag_mats(p, scale_bounds, depth, dtype):
    """(C, P) block-diagonal prototype matrix + the factored scale
    masks: channel->scale (C, S) and scale->prototype one-hot (S, P).
    The ||x||^2 term is per-SCALE, not per-prototype, so routing it
    through the two tiny masks ((bhw,C)@(C,S) then (bhw,S)@(S,P))
    costs ~S/C of the naive (bhw,C)@(C,P) mask matmul — at the
    ADE/COCO bank sizes (P=1800-2184) the naive form measurably
    regressed the step (+2-3 ms, r5)."""
    num_active = scale_bounds[-1][1]
    num_scales = len(scale_bounds)
    c_total = num_scales * depth
    w = jnp.zeros((c_total, num_active), dtype)
    m_cs = np.zeros((c_total, num_scales), np.float32)
    o_sp = np.zeros((num_scales, num_active), np.float32)
    for s, (lo, hi) in enumerate(scale_bounds):
        w = w.at[s * depth:(s + 1) * depth, lo:hi].set(
            p[lo:hi].astype(dtype).T)
        m_cs[s * depth:(s + 1) * depth, s] = 1.0
        o_sp[s, lo:hi] = 1.0
    return w, jnp.asarray(m_cs, dtype), jnp.asarray(o_sp, dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _blockdiag_distances_bf16(x, p, scale_bounds):
    out, _ = _blockdiag_fwd(x, p, scale_bounds)
    return out


def _blockdiag_fwd(x, p, scale_bounds):
    depth = x.shape[-1] // len(scale_bounds)
    num_active = scale_bounds[-1][1]
    w, m_cs, o_sp = _blockdiag_mats(p, scale_bounds, depth, jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    p32 = p[:num_active].astype(jnp.float32)
    p_sq = jnp.einsum("pd,pd->p", p32, p32)
    x2s = jnp.einsum("bhwc,cs->bhws", xb * xb, m_cs,
                     preferred_element_type=jnp.float32)
    sq = jnp.einsum("bhws,sp->bhwp", x2s.astype(jnp.bfloat16), o_sp,
                    preferred_element_type=jnp.float32)
    cross = jnp.einsum("bhwc,cp->bhwp", xb, w,
                       preferred_element_type=jnp.float32)
    dist = jax.nn.relu(sq - 2.0 * cross + p_sq)
    return dist, (x, p, dist)


def _blockdiag_bwd(scale_bounds, res, g):
    x, p, dist = res
    depth = x.shape[-1] // len(scale_bounds)
    w, m_cs, o_sp = _blockdiag_mats(p, scale_bounds, depth, jnp.bfloat16)
    g = g * (dist > 0)
    gb = g.astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    # dx = 2x * (g routed back through the factored scale masks)
    #      - 2 (g @ W^T), all bf16 full-res
    gs = jnp.einsum("bhwp,sp->bhws", gb, o_sp,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    gm = jnp.einsum("bhws,cs->bhwc", gs, m_cs,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    gw = jnp.einsum("bhwp,cp->bhwc", gb, w,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    dx = (2.0 * (xb * gm - gw)).astype(x.dtype)
    # prototype grads: fp32 accumulation (params are fp32)
    dcross = jnp.einsum("bhwc,bhwp->cp", xb, gb,
                        preferred_element_type=jnp.float32)
    g_sum = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))  # (P,)
    dp = jnp.zeros(p.shape, jnp.float32)
    for s, (lo, hi) in enumerate(scale_bounds):
        blk = dcross[s * depth:(s + 1) * depth, lo:hi].T  # (Ps, D)
        dp = dp.at[lo:hi].set(
            -2.0 * blk
            + 2.0 * p[lo:hi].astype(jnp.float32) * g_sum[lo:hi, None])
    return dx, dp.astype(p.dtype)


_blockdiag_distances_bf16.defvjp(_blockdiag_fwd, _blockdiag_bwd)


def scale_l2_distances(features: jax.Array, prototypes: jax.Array,
                       scale_bounds: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Per-scale squared-L2 distances between pixels and prototypes.

    Args:
      features: (B, H, W, S*D) NHWC feature map (any float dtype; the
        ASPP-concat backbone emits scale s in channels [s*D, (s+1)*D)).
      prototypes: (P, D) prototype bank; scale s owns rows
        ``scale_bounds[s]``.
      scale_bounds: static per-scale (start, end) row ranges.

    Returns:
      (B, H, W, P) fp32 distances, ReLU-clamped, prototype-major in bank
      order (scale-major), i.e. the NHWC transpose of the reference's
      (B, P, H, W) output.
    """
    num_scales = len(scale_bounds)
    depth = features.shape[-1] // num_scales
    # bf16 features (the TPU training/serving recipe) take the
    # block-diagonal matmul form above: bf16 MXU with fp32 accumulation,
    # rank-2 layouts, bf16 backward.  Prototypes are fp32 params;
    # rounding them to bf16 inside that path is the one real precision
    # change, and only on the already-bf16-validated recipe
    # (benchmarks/bench_bf16_divergence.py).  The distance assembly and
    # the log activation stay fp32 (eps=1e-4 < bf16 resolution).
    if features.dtype == jnp.bfloat16:
        return _blockdiag_distances_bf16(features, prototypes,
                                         tuple(scale_bounds))
    x32 = features.astype(jnp.float32)
    p32 = prototypes.astype(jnp.float32)

    sizes = {hi - lo for lo, hi in scale_bounds}
    num_active = scale_bounds[-1][1]
    if len(sizes) == 1 and num_active == num_scales * sizes.pop():
        # Regular per-scale sizes: batch all scales through one einsum.
        # Rows past the last bound (floor-division leftovers, e.g. COCO
        # group 2054 -> 4 x 513) are inactive and simply dropped.
        b, h, w, _ = features.shape
        xs = x32.reshape(b, h, w, num_scales, depth)
        ps = p32[:num_active].reshape(num_scales, -1, depth)
        x_sq = jnp.einsum("bhwsd,bhwsd->bhws", xs, xs,
                          preferred_element_type=jnp.float32)[..., None]
        p_sq = jnp.einsum("spd,spd->sp", ps, ps,
                          preferred_element_type=jnp.float32)
        cross = jnp.einsum("bhwsd,spd->bhwsp", xs, ps,
                           preferred_element_type=jnp.float32)
        dist = x_sq - 2.0 * cross + p_sq[None, None, None]
        return jax.nn.relu(dist).reshape(b, h, w, -1)

    # Irregular bank (post-prune): static loop over scales.
    out = []
    for s, (lo, hi) in enumerate(scale_bounds):
        xs = x32[..., s * depth:(s + 1) * depth]
        ps = p32[lo:hi]
        x_sq = jnp.einsum("bhwd,bhwd->bhw", xs, xs,
                          preferred_element_type=jnp.float32)[..., None]
        p_sq = jnp.einsum("pd,pd->p", ps, ps,
                          preferred_element_type=jnp.float32)
        cross = jnp.einsum("bhwd,pd->bhwp", xs, ps,
                           preferred_element_type=jnp.float32)
        out.append(jax.nn.relu(x_sq - 2.0 * cross + p_sq))
    return jnp.concatenate(out, axis=-1)


def pad_minima_to_bank(vals: jax.Array, idxs: jax.Array, spec) -> Tuple[
        jax.Array, jax.Array]:
    """Pad per-image (B, Pa) prototype minima/argmins from the distance
    layout back to bank width: dangling floor-division-leftover rows get
    +inf so they can never win a scan (push / find_nearest)."""
    pad = spec.num_prototypes - spec.num_active_prototypes
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=jnp.inf)
        idxs = jnp.pad(idxs, ((0, 0), (0, pad)))
    return vals, idxs


def distance_to_similarity(distances: jax.Array, activation: str = "log",
                           epsilon: float = EPSILON) -> jax.Array:
    """Distance -> similarity (ref model_multiscale.py:324-330)."""
    if activation == "log":
        d32 = distances.astype(jnp.float32)
        return jnp.log((d32 + 1.0) / (d32 + epsilon))
    if activation == "linear":
        return -distances
    raise ValueError(f"Unknown prototype activation: {activation}")


def pairwise_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """All-pairs L2 distances, (n, d) x (m, d) -> (n, m)
    (ref helpers.py:10-11 ``list_of_distances``: squared L2 there)."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    sq = (jnp.sum(a32 * a32, -1)[:, None] - 2.0 * a32 @ b32.T
          + jnp.sum(b32 * b32, -1)[None, :])
    return jax.nn.relu(sq)
