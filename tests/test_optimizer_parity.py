"""Optimizer parity: our optax chain (coupled weight decay -> Adam ->
poly schedule) must follow torch Adam(weight_decay=..) + PolynomialLR
trajectories exactly (ref module_multiscale.py:393-463 + the submodule's
PolynomialLR: lr * (1 - step/iter_max)^power stepped per optimizer step)."""

import numpy as np
import pytest

import jax.numpy as jnp

from scaleprotoseg_tpu.train.optim import (OptimGroup,
                                           make_phase_optimizer,
                                           poly_schedule)

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("wd,use_sched", [(0.0, False), (5e-4, True)])
def test_adam_trajectory_matches_torch(rng, wd, use_sched):
    lr, power, iter_max, steps = 2.5e-3, 0.9, 20, 12
    w0 = rng.standard_normal(16).astype(np.float32)
    grads = [rng.standard_normal(16).astype(np.float32)
             for _ in range(steps)]

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda t: max(1.0 - t / iter_max, 0.0) ** power) \
        if use_sched else None
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()
        if sched is not None:
            sched.step()
    expected = wt.detach().numpy()

    # our side
    groups = {"g": OptimGroup(lr, weight_decay=wd, use_schedule=use_sched)}
    tx = make_phase_optimizer(
        groups, {"w": "g"},
        schedule=poly_schedule(power, iter_max) if use_sched else None)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]), expected,
                               rtol=2e-5, atol=2e-6)


def test_multisteps_accumulation_matches_torch_iter_size(rng):
    """iter_size accumulation: the reference backwards loss/iter_size per
    micro-batch and steps every iter_size (module_multiscale.py:291-298);
    MultiSteps' gradient mean is the same update."""
    lr, iter_size, micro = 1e-3, 3, 9
    w0 = rng.standard_normal(8).astype(np.float32)
    grads = [rng.standard_normal(8).astype(np.float32)
             for _ in range(micro)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr)
    acc = torch.zeros(8)
    for i, g in enumerate(grads):
        acc += torch.from_numpy(g) / iter_size
        if (i + 1) % iter_size == 0:
            wt.grad = acc.clone()
            opt.step()
            opt.zero_grad()
            acc = torch.zeros(8)
    expected = wt.detach().numpy()

    groups = {"g": OptimGroup(lr)}
    tx = make_phase_optimizer(groups, {"w": "g"}, iter_size=iter_size)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]), expected,
                               rtol=2e-5, atol=2e-6)
