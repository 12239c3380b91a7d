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

from typing import Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-4  # ref model_multiscale.py:106 (self.epsilon)


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
        x_sq = jnp.sum(xs * xs, axis=-1, keepdims=True)        # (B,H,W,S,1)
        p_sq = jnp.sum(ps * ps, axis=-1)                       # (S,Ps)
        cross = jnp.einsum("bhwsd,spd->bhwsp", xs, ps,
                           preferred_element_type=jnp.float32)
        dist = x_sq - 2.0 * cross + p_sq[None, None, None]
        return jax.nn.relu(dist).reshape(b, h, w, -1)

    # Irregular bank (post-prune): static loop over scales.
    out = []
    for s, (lo, hi) in enumerate(scale_bounds):
        xs = x32[..., s * depth:(s + 1) * depth]
        ps = p32[lo:hi]
        x_sq = jnp.sum(xs * xs, axis=-1, keepdims=True)
        p_sq = jnp.sum(ps * ps, axis=-1)
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
