"""SIGTERM-graceful checkpointing (train/preemption.py).

SURVEY.md §5 lists failure detection as absent upstream; the framework's
contract is: SIGTERM -> commit the full train state at the next step
boundary -> exit 143, and relaunching the same command resumes the exact
trajectory (composing with test_resume's bit-exact resume)."""

import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.train import preemption


@pytest.fixture
def fresh_guard():
    prev = signal.getsignal(signal.SIGTERM)
    preemption._guard = None
    yield
    preemption._guard = None
    signal.signal(signal.SIGTERM, prev)


def test_guard_flag_and_exit_code(fresh_guard):
    guard = preemption.get_guard(log=lambda *a: None)
    assert preemption.get_guard() is guard  # process-wide singleton
    assert not guard.should_stop(0)
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.should_stop(1)
    exc = preemption.Preempted(7)
    assert isinstance(exc, SystemExit)
    assert exc.code == 143  # 128 + SIGTERM: what schedulers expect
    assert "step 7" in str(exc)


def test_guard_multiprocess_coordination(fresh_guard, monkeypatch):
    """Multi-process guards defer to JAX's preemption sync service (the
    collective Orbax save must happen at the SAME step everywhere); with
    the service unavailable the guard disables itself rather than let a
    local flag desynchronize the collective."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    guard = preemption.PreemptionGuard(log=lambda *a: None)
    # no jax.distributed client in tests: the sync point reports False
    assert not guard.should_stop(0)

    from jax.experimental import multihost_utils

    def boom(step):
        raise RuntimeError("Preemption sync manager has not been "
                           "initialized")

    monkeypatch.setattr(multihost_utils, "reached_preemption_sync_point",
                        boom)
    assert not guard.should_stop(1)
    assert not guard._sync_ok  # disabled, not retried
    assert not guard.should_stop(2)
    # and a local SIGTERM flag is ignored in multi-process mode
    guard._flag = True
    assert not guard.should_stop(3)


class _KillAfter:
    """Yields the inner loader's batches, delivering SIGTERM to the own
    process just before batch index ``k`` (so the runner preempts at
    step k+1)."""

    def __init__(self, inner, k):
        self.inner, self.k = inner, k

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        for i, batch in enumerate(self.inner):
            if i == self.k:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


@pytest.mark.slow  # three toy phase runs on 1 core
def test_preempt_then_relaunch_matches_straight_run(tmp_path, fresh_guard):
    """run_phase commits the state and raises Preempted on SIGTERM; a
    fresh trainer (the relaunched command) resumes to the same params as
    an uninterrupted run."""
    from test_resume import HPARAMS, _DetDataset, _FakeLoader

    from scaleprotoseg_tpu.data.loader import DataLoader
    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.spec import ProtoSpec
    from scaleprotoseg_tpu.train.metrics import MetricsLogger
    from scaleprotoseg_tpu.train.runner import PhaseTrainer

    spec = ProtoSpec.equal_allocation(24, 8, 3, 4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 33, 33, 3))))
    val_loader = _FakeLoader(np.random.default_rng(9), n=2)
    fresh = lambda: jax.tree.map(jnp.array, variables)  # noqa: E731

    def make_loader():
        return DataLoader(_DetDataset(), batch_size=2, shuffle=True,
                          seed=5, num_workers=2)

    def make_trainer(d):
        return PhaseTrainer(model, spec, "multiscale", str(d), HPARAMS,
                            logger=MetricsLogger(str(d)),
                            log=lambda *a: None)

    res_full = make_trainer(tmp_path / "straight").run_phase(
        fresh(), phase=2, max_steps=5, train_loader=make_loader(),
        val_loader=val_loader, val_every_steps=2)

    kill_dir = tmp_path / "killed"
    with pytest.raises(preemption.Preempted) as exc:
        make_trainer(kill_dir).run_phase(
            fresh(), phase=2, max_steps=5,
            train_loader=_KillAfter(make_loader(), 2),
            val_loader=val_loader, val_every_steps=2)
    assert exc.value.step == 3
    assert exc.value.code == 143
    state_dir = kill_dir / "checkpoints" / "push_state"
    assert state_dir.is_dir()

    # the relaunch: fresh process state (new guard, no flag), same command
    preemption._guard = None
    res_b = make_trainer(kill_dir).run_phase(
        fresh(), phase=2, max_steps=5, train_loader=make_loader(),
        val_loader=val_loader, val_every_steps=2)
    assert res_b.steps_done == 5
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        res_full.state.params, res_b.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        res_full.state.opt_state, res_b.state.opt_state)
