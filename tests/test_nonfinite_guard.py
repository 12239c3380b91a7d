"""Non-finite gradient guard: a NaN batch must not corrupt training."""

import numpy as np

import jax.numpy as jnp

from scaleprotoseg_tpu.train.optim import (OptimGroup,
                                           make_phase_optimizer)


def test_nan_grads_are_skipped(rng):
    w0 = rng.standard_normal(8).astype(np.float32)
    tx = make_phase_optimizer({"g": OptimGroup(1e-2)}, {"w": "g"},
                              guard_nonfinite=3)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    good = {"w": jnp.asarray(rng.standard_normal(8).astype(np.float32))}
    updates, state = tx.update(good, state, params)
    params1 = {"w": params["w"] + updates["w"]}
    assert not np.allclose(np.asarray(params1["w"]), w0)

    bad = {"w": jnp.full((8,), np.nan, jnp.float32)}
    updates, state = tx.update(bad, state, params1)
    params2 = {"w": params1["w"] + updates["w"]}
    # NaN step skipped entirely: params unchanged and still finite
    np.testing.assert_allclose(np.asarray(params2["w"]),
                               np.asarray(params1["w"]))
    assert np.isfinite(np.asarray(params2["w"])).all()

    # training continues normally afterwards
    updates, state = tx.update(good, state, params2)
    params3 = {"w": params2["w"] + updates["w"]}
    assert np.isfinite(np.asarray(params3["w"])).all()
    assert not np.allclose(np.asarray(params3["w"]),
                           np.asarray(params2["w"]))
