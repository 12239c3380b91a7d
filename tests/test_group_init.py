"""Equivariance-JSON group init parity
(ref model_multiscale_group.py:522-586)."""

import json

import numpy as np
import pytest

from scaleprotoseg_tpu.models.group_init import (apply_equivariance_init,
                                                 equivariance_group_weights)
from scaleprotoseg_tpu.spec import ProtoSpec


def _simplex_rows(c, g, pc, n_cols, rng):
    w = np.zeros((c, g, pc), np.float32)
    w[..., :n_cols] = rng.random((c, g, n_cols))
    w[..., :n_cols] /= w[..., :n_cols].sum(-1, keepdims=True)
    return w


def test_equivariance_init_semantics():
    # 2 classes, 4 scales, 2 protos per (class, scale) -> 8 cols per class
    spec = ProtoSpec.equal_allocation(16, 4, 2, 4, num_groups=3)
    rng = np.random.default_rng(0)
    w0 = _simplex_rows(2, 3, spec.max_protos_per_class,
                       int(spec.class_counts[0]), rng)
    weight = 0.25
    # class 0, group 0: scale 0 local protos [0, 1], scale 2 local proto [1]
    equiv = {0: [[[0, 1], [], [1], []]]}
    w = equivariance_group_weights(w0, spec, equiv, weight)

    # listed prototypes: weight / len(scale list)
    # scale 0 contributes cols 0,1 (offset 0); scale 2 col 2*2+1=5
    np.testing.assert_allclose(w[0, 0, 0], weight / 2)
    np.testing.assert_allclose(w[0, 0, 1], weight / 2)
    np.testing.assert_allclose(w[0, 0, 5], weight)
    # remaining entries rescaled by (1 - tot_scale*w)/(1 - tot_org)
    tot_org = w0[0, 0, 0] + w0[0, 0, 1] + w0[0, 0, 5]
    factor = (1 - 2 * weight) / (1 - tot_org)
    for col in (2, 3, 4, 6, 7):
        np.testing.assert_allclose(w[0, 0, col], w0[0, 0, col] * factor,
                                   rtol=1e-6)
    # row stays on the simplex
    np.testing.assert_allclose(w[0, 0].sum(), 1.0, rtol=1e-5)
    # untouched rows/classes unchanged
    np.testing.assert_allclose(w[0, 1], w0[0, 1])
    np.testing.assert_allclose(w[1], w0[1])


def test_equivariance_init_waives_group_expansion():
    spec = ProtoSpec.equal_allocation(16, 4, 2, 4, num_groups=3)
    w0 = np.zeros((2, 3, spec.max_protos_per_class), np.float32)
    equiv = {0: [[[0]]] * 4}  # 4 groups > num_groups=3
    with pytest.raises(NotImplementedError, match="waived"):
        equivariance_group_weights(w0, spec, equiv, 0.25)


def test_apply_from_json(tmp_path):
    spec = ProtoSpec.equal_allocation(16, 4, 2, 4, num_groups=3)
    rng = np.random.default_rng(1)
    w0 = _simplex_rows(2, 3, spec.max_protos_per_class,
                       int(spec.class_counts[0]), rng)
    path = tmp_path / "equiv.json"
    path.write_text(json.dumps({"1": [[[0], [1], [], []]]}))
    out = apply_equivariance_init({"group_projection": w0}, spec,
                                  str(path), weight=0.3,
                                  log=lambda *a: None)
    w = np.asarray(out["group_projection"])
    np.testing.assert_allclose(w[1, 0, 0], 0.3)       # scale 0 local 0
    np.testing.assert_allclose(w[1, 0, 3], 0.3)       # scale 1 local 1
    np.testing.assert_allclose(w[1, 0].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(w[0], w0[0])
