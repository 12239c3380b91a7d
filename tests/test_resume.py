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


class _DetDataset:
    """Items are a pure function of (epoch, index) — stands in for a
    det_seed PatchClassificationDataset without touching disk."""

    def __init__(self, n=8):
        self.n = n
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = int(epoch)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 * (self.epoch + 1) + i)
        return (rng.standard_normal((33, 33, 3)).astype(np.float32),
                rng.integers(0, 4, (33, 33)).astype(np.int32))


@pytest.mark.slow  # ~55 s on 1 core (three 6-step toy phases)
def test_exact_resume_trajectory(tmp_path):
    """Kill/resume lands on the uninterrupted run bit-for-bit: the Orbax
    state restores params + Adam moments exactly, fast_forward continues
    the deterministic data stream where it stopped, and best-checkpoint
    tracking survives the restart (runner.py resume block)."""
    from scaleprotoseg_tpu.data.loader import DataLoader

    spec = ProtoSpec.equal_allocation(24, 8, 3, 4)
    model = PPNet(backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                                     aspp_mode="concat"),
                  spec=spec, backbone_channels=32)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 33, 33, 3))))

    def make_loader():
        return DataLoader(_DetDataset(), batch_size=2, shuffle=True,
                          seed=5, num_workers=2)

    def make_val_loader():
        # det VAL loader too: val items draw augmentation randomness by
        # epoch, and the runner fast-forwards the val stream on resume
        # (one epoch per completed validation) so val_acc — and thus
        # best-checkpoint promotion — matches the straight run
        return DataLoader(_DetDataset(n=4), batch_size=2, shuffle=False,
                          seed=7, num_workers=2)

    def make_trainer(d):
        return PhaseTrainer(model, spec, "multiscale", str(d), HPARAMS,
                            logger=MetricsLogger(str(d)),
                            log=lambda *a: None)

    # the train step donates its state buffers, so each run gets its
    # own copy of the init
    fresh = lambda: jax.tree.map(jnp.array, variables)  # noqa: E731

    # uninterrupted: 6 steps (1.5 epochs), validating every 2
    res_full = make_trainer(tmp_path / "straight").run_phase(
        fresh(), phase=2, max_steps=6, train_loader=make_loader(),
        val_loader=make_val_loader(), val_every_steps=2)

    # interrupted at 4 steps, then a FRESH trainer + loader resumes to 6
    kill_dir = tmp_path / "killed"
    res_a = make_trainer(kill_dir).run_phase(
        fresh(), phase=2, max_steps=4, train_loader=make_loader(),
        val_loader=make_val_loader(), val_every_steps=2)
    trainer2 = make_trainer(kill_dir)
    res_b = trainer2.run_phase(
        fresh(), phase=2, max_steps=6, train_loader=make_loader(),
        val_loader=make_val_loader(), val_every_steps=2)

    assert res_b.steps_done == 6
    assert res_b.best_acc == res_full.best_acc  # val stream resumed too
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        res_full.state.params, res_b.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        res_full.state.opt_state, res_b.state.opt_state)
    # best-acc tracking carried over the restart
    assert res_b.best_acc >= res_a.best_acc > 0.0

    # regression: train metrics must stay live past the first validation
    # (the bulk fetcher used to keep feeding a dead accumulator after the
    # post-validation rebind, logging train_loss=0 forever)
    import json
    with open(tmp_path / "straight" / "metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert len(records) >= 3
    assert all(r["train_loss"] > 0 for r in records)
