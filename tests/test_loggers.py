"""External logger bindings (ref train_wandb_multiscale.py:150-186):
TB + CSV always, W&B behind the USE_WANDB env gate with
resume-by-run-name, reference metric names flowing through."""

import json
import os
import sys
import types

import pytest


class _FakeRun:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.id = "fake-run-id"
        self.config = self
        self.updates = []

    def update(self, params, allow_val_change=False):
        self.updates.append(dict(params))


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_calls = []
        self.logged = []
        self.run = None

    def init(self, **kwargs):
        self.init_calls.append(kwargs)
        self.run = _FakeRun(**kwargs)
        return self.run

    def log(self, record, step=None):
        self.logged.append((dict(record), step))

    def finish(self):
        pass


@pytest.fixture
def fake_wandb(monkeypatch):
    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.setenv("USE_WANDB", "1")
    monkeypatch.setenv("WANDB_PROJECT", "proj")
    monkeypatch.setenv("WANDB_USER", "user")
    return fake


def test_wandb_sink_reference_metric_names(tmp_path, fake_wandb):
    from scaleprotoseg_tpu.train.metrics import (MetricsLogger,
                                                 make_external_sinks)
    sinks = make_external_sinks(str(tmp_path), "run1",
                                config_name="scaleproto_cityscapes")
    logger = MetricsLogger(str(tmp_path), sinks=sinks)
    logger.log_hyperparams({"construct_PPNet.num_classes": 19})
    record = {"train_loss": 1.0, "train_cross_entropy": 0.5,
              "train_kld_loss": 0.1, "val_accuracy": 0.7, "l1": 2.0,
              "avg_dist_proto": 3.0, "lr": 1e-4, "training_stage": 1.0}
    logger.log(record, step=5)

    # new run created with the reference's tags + name
    call = fake_wandb.init_calls[0]
    assert call["project"] == "proj" and call["entity"] == "user"
    assert call["name"] == "run1"
    assert call["tags"] == ["scaleproto_cityscapes", "segmentation",
                            "protopnet"]
    # hyperparams captured (operative-config analog)
    assert fake_wandb.run.updates[0] == {"construct_PPNet.num_classes": 19}
    # metrics flow through with reference names at the right step
    logged, step = fake_wandb.logged[0]
    assert step == 5
    for k in record:
        assert logged[k] == record[k]
    # JSONL sink still wrote the same record
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        row = json.loads(f.readline())
    assert row["val_accuracy"] == 0.7


def test_wandb_resume_by_run_name(tmp_path, fake_wandb):
    from scaleprotoseg_tpu.train.metrics import make_external_sinks
    make_external_sinks(str(tmp_path), "run1",
                        wandb_experiment="existing-run")
    call = fake_wandb.init_calls[0]
    assert call["name"] == "existing-run"
    assert call["resume"] == "allow"
    assert "tags" not in call


def test_use_wandb_gate_off(tmp_path, fake_wandb, monkeypatch):
    monkeypatch.setenv("USE_WANDB", "0")
    from scaleprotoseg_tpu.train.metrics import make_external_sinks
    sinks = make_external_sinks(str(tmp_path), "run1")
    assert not fake_wandb.init_calls
    assert all(type(s).__name__ != "WandbSink" for s in sinks)


def test_tensorboard_sink_writes_events(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    from scaleprotoseg_tpu.train.metrics import MetricsLogger, TensorBoardSink
    logger = MetricsLogger(str(tmp_path),
                           sinks=[TensorBoardSink(str(tmp_path))])
    logger.log({"train_loss": 1.5}, step=1)
    logger.finish()
    tb_dir = os.path.join(tmp_path, "logs", "tb")
    assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_metric_accumulator_reset_keeps_bound_update_live():
    """reset() clears in place so a held `update` reference (e.g. inside
    a BulkFetcher) keeps feeding the SAME accumulator — rebinding a
    fresh one used to orphan every post-validation train metric."""
    from scaleprotoseg_tpu.train.metrics import MetricAccumulator

    acc = MetricAccumulator()
    update = acc.update
    update({"loss": 2.0, "n_correct": 1, "n_patches": 2})
    assert acc.summary()["loss"] == 2.0
    acc.reset()
    assert acc.summary() == {}
    update({"loss": 4.0, "n_correct": 1, "n_patches": 2})
    s = acc.summary()
    assert s["loss"] == 4.0 and s["accuracy"] == 0.5
