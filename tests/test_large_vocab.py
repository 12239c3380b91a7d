"""Large-vocabulary shape regimes: ADE20K (1800 protos / 150 classes) and
COCO-Stuff (2054 / 182, with floor-division leftover prototypes)."""

import numpy as np

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.losses import (entropy_group_loss, kld_loss,
                                      pixel_wise_cross_entropy)
from scaleprotoseg_tpu.spec import ProtoSpec


def test_ade_scale_losses(rng):
    spec = ProtoSpec.equal_allocation(1800, 64, num_classes=150,
                                      num_scales=4)
    assert spec.is_regular and (spec.class_scale_counts == 3).all()
    d = jnp.asarray(rng.random((2, 17, 17, 1800)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 151, (2, 17, 17)), jnp.int32)
    v = float(jax.jit(lambda d, t: kld_loss(d, t, spec))(d, t))
    assert np.isfinite(v) and 0 <= v <= 1


def test_coco_scale_leftover_prototypes(rng):
    # 2054 // 182 // 4 = 2 per (class, scale): 598 prototypes stay
    # unassigned (identity row zero) exactly like the reference's
    # floor-division allocation (model_multiscale.py:131-141), and
    # 2054 // 4 = 513 per scale leaves bank rows 2052-2053 outside every
    # scale bound — the model's distance tensor is 2052 wide.
    spec = ProtoSpec.equal_allocation(2054, 64, num_classes=182,
                                      num_scales=4, num_groups=3)
    assert spec.class_ids.count(-1) == 2054 - 182 * 4 * 2
    assert (spec.class_counts == 8).all()
    assert spec.num_active_prototypes == 2052
    assert spec.class_scale_proto_onehot.shape[-1] == 2052
    # losses consume the model's distance layout (active width)
    d = jnp.asarray(rng.random((1, 9, 9, 2052)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 183, (1, 9, 9)), jnp.int32)
    v = float(jax.jit(lambda d, t: kld_loss(d, t, spec))(d, t))
    assert np.isfinite(v)
    logits = jnp.asarray(rng.standard_normal((1, 9, 9, 182)), jnp.float32)
    ce, _, _ = pixel_wise_cross_entropy(logits, t)
    assert np.isfinite(float(ce))
    gw = jnp.asarray(rng.random((182, 3, 8)), jnp.float32)
    gw = gw / gw.sum(-1, keepdims=True)
    assert np.isfinite(float(entropy_group_loss(gw, spec)))
