"""Fused Pallas prototype-head kernel vs the XLA reference path
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.ops.pallas_proto import (fused_proto_logits,
                                                pack_prototype_bank)
from scaleprotoseg_tpu.ops.prototype import (distance_to_similarity,
                                             scale_l2_distances)
from scaleprotoseg_tpu.spec import ProtoSpec


def _problem(rng, grouped=False, num_classes=19, P=228, D=16, S=4):
    spec = ProtoSpec.equal_allocation(P, D, num_classes=num_classes,
                                      num_scales=S,
                                      num_groups=3 if grouped else 0)
    feats = jnp.asarray(
        rng.random((2, 9, 9, spec.feature_depth)), jnp.float32)
    protos = jnp.asarray(rng.random((P, D)), jnp.float32)
    return spec, feats, protos


def test_pack_prototype_bank_block_structure(rng):
    spec, feats, protos = _problem(rng, P=24, D=8, S=4, num_classes=3)
    pdT, mt, pn = pack_prototype_bank(protos, spec)
    pdT, mt, pn = map(np.asarray, (pdT, mt, pn))
    assert pdT.shape == (32, 128)
    for p in range(24):
        s = spec.scale_ids[p]
        np.testing.assert_allclose(pdT[s * 8:(s + 1) * 8, p],
                                   np.asarray(protos)[p])
        # zeros outside the scale block
        blockless = np.delete(pdT[:, p], slice(s * 8, (s + 1) * 8))
        assert (blockless == 0).all()
        assert mt[s * 8:(s + 1) * 8, p].sum() == 8
    np.testing.assert_allclose(
        pn[0, :24], (np.asarray(protos) ** 2).sum(-1), rtol=1e-6)
    assert (pn[0, 24:] == 0).all()


def _xla_plain(feats, protos, w, spec):
    d = scale_l2_distances(feats, protos, spec.scale_bounds)
    act = distance_to_similarity(d)
    return jnp.einsum("...p,pc->...c", act, w)


def _xla_group(feats, protos, gw, glw, spec):
    d = scale_l2_distances(feats, protos, spec.scale_bounds)
    act = distance_to_similarity(d)
    idx = jnp.asarray(np.maximum(spec.class_proto_index, 0))
    act_sel = jnp.take(act, idx, axis=-1)
    scores = jnp.einsum("...cp,cgp->...cg", act_sel, gw)
    group = jnp.exp(scores) * jnp.asarray(spec.class_has_protos)[:, None]
    flat = group.reshape(group.shape[:-2] + (-1,))
    return jnp.einsum("...k,kc->...c", flat, glw)


def test_fused_plain_head_matches_xla(rng):
    spec, feats, protos = _problem(rng)
    w = jnp.asarray(rng.standard_normal(
        (spec.num_prototypes, spec.num_classes)), jnp.float32)
    expected = np.asarray(_xla_plain(feats, protos, w, spec))
    got = np.asarray(fused_proto_logits(feats, protos, w, spec,
                                        interpret=True, tile_n=128))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_fused_group_head_matches_xla(rng):
    spec, feats, protos = _problem(rng, grouped=True)
    gw = jnp.asarray(rng.random(
        (spec.num_classes, spec.num_groups, spec.max_protos_per_class)),
        jnp.float32) * jnp.asarray(spec.class_proto_mask)[:, None, :]
    glw = jnp.asarray(rng.standard_normal(
        (spec.num_classes * spec.num_groups, spec.num_classes)) * 0.1,
        jnp.float32)
    expected = np.asarray(_xla_group(feats, protos, gw, glw, spec))
    got = np.asarray(fused_proto_logits(
        feats, protos, None, spec, group_projection=gw,
        last_layer_group=glw, interpret=True, tile_n=128))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_fused_handles_nonmultiple_pixels(rng):
    # 2*7*5 = 70 pixels, tile 128 -> padding path
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4)
    feats = jnp.asarray(rng.random((2, 7, 5, 32)), jnp.float32)
    protos = jnp.asarray(rng.random((24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 3)), jnp.float32)
    expected = np.asarray(_xla_plain(feats, protos, w, spec))
    got = np.asarray(fused_proto_logits(feats, protos, w, spec,
                                        interpret=True, tile_n=128))
    assert got.shape == (2, 7, 5, 3)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
