"""Euclidean projection onto the probability simplex.

Exact JAX equivalent of the reference's sort-based algorithm
(`segmentation/utils.py:113-124`), applied to the group-projection weight
rows after init and after every optimizer step
(`model_multiscale_group.py:516-517`,
`module_multiscale_group_train.py:337-338`).

Also provides a masked variant for the framework's padded dense group
layout, where each (class, group) row carries ``Pc_max`` slots of which
only the first ``Pc`` are real prototypes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def projection_simplex_sort(v: jax.Array, z: float = 1.0) -> jax.Array:
    """Project each row of ``v`` (..., n) onto {w >= 0, sum w = z}."""
    n = v.shape[-1]
    u = -jnp.sort(-v, axis=-1)                       # descending
    cssv = jnp.cumsum(u, axis=-1) - z
    ind = jnp.arange(1, n + 1, dtype=v.dtype)
    cond = (u - cssv / ind) > 0
    # rho = largest index (1-based) where cond holds; matches the reference's
    # ``(ind * cond).max(1)`` which returns both max value and its position.
    rho = jnp.max(ind * cond, axis=-1)
    ind_rho = jnp.argmax(ind * cond, axis=-1)
    theta = jnp.take_along_axis(cssv, ind_rho[..., None], axis=-1)[..., 0] / rho
    return jnp.maximum(v - theta[..., None], 0.0)


def projection_simplex_sort_masked(v: jax.Array, mask: jax.Array,
                                   z: float = 1.0) -> jax.Array:
    """Masked simplex projection: only entries with ``mask==1`` participate;
    masked-out entries are returned as 0.

    Used for padded (C, G, Pc_max) group-weight tensors where classes may
    own fewer than ``Pc_max`` prototypes (post-pruning).
    """
    n = v.shape[-1]
    vm = jnp.where(mask > 0, v, _NEG_BIG)
    u = -jnp.sort(-vm, axis=-1)                      # valid entries first
    u_safe = jnp.where(u <= _NEG_BIG / 2, 0.0, u)
    cssv = jnp.cumsum(u_safe, axis=-1) - z
    ind = jnp.arange(1, n + 1, dtype=v.dtype)
    valid_rank = jnp.sum(mask > 0, axis=-1, keepdims=True)  # (..., 1)
    in_range = ind <= valid_rank
    cond = ((u_safe - cssv / ind) > 0) & in_range
    rho = jnp.max(ind * cond, axis=-1)
    ind_rho = jnp.argmax(ind * cond, axis=-1)
    theta = jnp.take_along_axis(cssv, ind_rho[..., None], axis=-1)[..., 0] / \
        jnp.maximum(rho, 1.0)
    w = jnp.maximum(v - theta[..., None], 0.0)
    return jnp.where(mask > 0, w, 0.0)
