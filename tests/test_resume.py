"""Mid-phase resume: a killed phase continues from its state checkpoint."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.spec import ProtoSpec
from scaleprotoseg_tpu.train.metrics import MetricsLogger
from scaleprotoseg_tpu.train.runner import PhaseTrainer
from scaleprotoseg_tpu.train.steps import LossWeights


class _FakeLoader:
    def __init__(self, rng, n=4, b=2):
        self.batches = [
            (rng.standard_normal((b, 33, 33, 3)).astype(np.float32),
             rng.integers(0, 4, (b, 33, 33)).astype(np.int32))
            for _ in range(n)]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


HPARAMS = dict(
    weights=LossWeights(), hp=dict(
        warm_lr_add_on=1e-3, warm_lr_protos=1e-3, warm_wd=0.0,
        joint_lr_features=1e-4, joint_lr_add_on=1e-3, joint_lr_protos=1e-3,
        joint_wd=0.0, last_layer_lr=1e-3, warm_lr_group=1e-3,
        joint_lr_group=1e-3),
    poly_lr_power=0.9, iter_size=1, ignore_void_class=True,
    freeze_type="all", joint_no_proto=False, joint_last=True)


def test_async_state_save_roundtrip(tmp_path):
    """Async orbax saves (SURVEY.md §5): save returns before the commit,
    back-to-back saves serialize, the barrier lands the write, and
    restore sees the LAST save's values."""
    import optax

    from scaleprotoseg_tpu.checkpoints.orbax_io import (
        restore_train_state, save_train_state, wait_for_checkpoints)
    from scaleprotoseg_tpu.train.state import TrainState

    params = {"w": jnp.arange(4.0), "b": jnp.zeros((2, 3))}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, None, tx.init(params))
    path = os.path.join(str(tmp_path), "state")

    save_train_state(path, state)                     # async
    state2 = state.replace(
        params={"w": state.params["w"] + 1.0,
                "b": state.params["b"] + 2.0},
        step=jnp.asarray(7))
    save_train_state(path, state2)                    # overwrites in flight
    wait_for_checkpoints()
    template = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), None, tx.init(params))
    restored = restore_train_state(path, template)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state2.params["w"]))
    # absent path -> None
    assert restore_train_state(os.path.join(str(tmp_path), "nope"),
                               template) is None


@pytest.mark.slow  # 47 s on 1 core; checkpoint round-trips stay fast
def test_mid_phase_resume(tmp_path):
    rng = np.random.default_rng(0)
    spec = ProtoSpec.equal_allocation(24, 8, 3, 4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 33, 33, 3))))
    loader = _FakeLoader(rng)

    trainer = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                           HPARAMS, logger=MetricsLogger(str(tmp_path)),
                           log=lambda *a: None)
    # first run: 4 steps with validation (and state save) every 2
    res1 = trainer.run_phase(variables, phase=2, max_steps=4,
                             train_loader=loader, val_loader=loader,
                             val_every_steps=2)
    state_dir = os.path.join(str(tmp_path), "checkpoints", "push_state")
    assert os.path.isdir(state_dir)

    # second trainer resumes: with max_steps=4 it should do 0 extra steps
    trainer2 = PhaseTrainer(model, spec, "multiscale", str(tmp_path),
                            HPARAMS, logger=MetricsLogger(str(tmp_path)),
                            log=lambda *a: None)
    res2 = trainer2.run_phase(variables, phase=2, max_steps=4,
                              train_loader=loader, val_loader=loader,
                              val_every_steps=2)
    assert res2.steps_done == 4  # resumed at 4, loop exits immediately
    np.testing.assert_allclose(
        np.asarray(res1.state.params["last_layer"]),
        np.asarray(res2.state.params["last_layer"]), rtol=1e-6)

    # and with a larger budget it continues past the restore point
    res3 = trainer2.run_phase(variables, phase=2, max_steps=6,
                              train_loader=loader, val_loader=loader,
                              val_every_steps=2)
    assert res3.steps_done == 6
    assert not np.allclose(
        np.asarray(res1.state.params["last_layer"]),
        np.asarray(res3.state.params["last_layer"]))
