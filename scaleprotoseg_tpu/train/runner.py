"""Phase orchestration: the Lightning-Trainer equivalent.

Drives one training phase (warm-up / joint / last-layer, proto or group
variant) over the threaded data loader with a jitted train step, periodic
validation, best-checkpoint tracking by val patch accuracy, optional
early stopping, and reference metric names
(`module_multiscale.py:326-391`, `train_wandb_multiscale.py:190-316`).

TPU specifics: batches are sharded over the data mesh axis before each
step (single-device mesh degenerates to plain placement), steps count
micro-batches exactly like the reference's Lightning ``global_step``
(``iter_size`` accumulation happens inside optax MultiSteps), and
``avg_dist_proto`` is computed on-device at validation end.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu import configlib
from scaleprotoseg_tpu.checkpoints.io import save_checkpoint
from scaleprotoseg_tpu.ops.prototype import pairwise_l2
from scaleprotoseg_tpu.parallel import (BulkFetcher,
                                         assemble_global_batch,
                                         create_mesh)
from scaleprotoseg_tpu.train.metrics import (MetricAccumulator,
                                             MetricsLogger)
from scaleprotoseg_tpu.train.optim import (label_params,
                                           make_phase_optimizer,
                                           partition_params, phase_groups,
                                           poly_schedule)
from scaleprotoseg_tpu.train.state import TrainState
from scaleprotoseg_tpu.train.steps import (LossWeights, make_eval_step,
                                           make_train_step)


def module_hparams(variant: str) -> Dict:
    """Collect PatchClassificationModule[MultiScale] gin bindings."""
    name = "PatchClassificationModule" if variant == "single" else \
        "PatchClassificationModuleMultiScale"
    q = lambda p, d: configlib.query(name, p, d)  # noqa: E731
    if variant != "group" and q("joint_last", None) is not None:
        # joint_last/joint_no_proto only shape the GROUP joint phase
        # (ref train_and_test.py:115-143); a proto-phase config setting
        # them would silently no-op — fail fast instead.
        raise ValueError(
            "joint_last is a group-phase flag; it has no effect on the "
            f"{variant!r} variant's phases")
    return dict(
        weights=LossWeights(
            crs_ent=q("loss_weight_crs_ent", 1.0),
            l1=q("loss_weight_l1", 1e-4),
            kld=q("loss_weight_kld", 0.0),
            entropy=q("loss_weight_entropy", 0.0),
            spatial_entropy=q("loss_weight_spatial_entropy", 0.0),
            norm=q("loss_weight_norm", 0.0),
            crs_ent_group=q("loss_weight_crs_ent_group", 0.0),
            scale_max=q("loss_weight_scale_max", 0.0),
            group_ent=q("loss_weight_group_ent", 0.0)),
        hp=dict(
            warm_lr_add_on=q("warm_optimizer_lr_add_on_layers", 2.5e-4),
            warm_lr_protos=q("warm_optimizer_lr_prototype_vectors", 2.5e-4),
            warm_wd=q("warm_optimizer_weight_decay", 0.0),
            joint_lr_features=q("joint_optimizer_lr_features", 2.5e-5),
            joint_lr_add_on=q("joint_optimizer_lr_add_on_layers", 2.5e-4),
            joint_lr_protos=q("joint_optimizer_lr_prototype_vectors",
                              2.5e-4),
            joint_wd=q("joint_optimizer_weight_decay", 0.0),
            last_layer_lr=q("last_layer_optimizer_lr", 2.5e-4),
            warm_lr_group=q("warm_optimizer_lr_group_projection", 2.5e-4),
            joint_lr_group=q("joint_optimizer_lr_group_projection",
                             2.5e-4)),
        poly_lr_power=q("poly_lr_power", 0.9),
        iter_size=q("iter_size", 1),
        ignore_void_class=q("ignore_void_class", True),
        freeze_type=q("freeze_type", "all"),
        joint_no_proto=q("joint_no_proto", False),
        joint_last=q("joint_last", True),
    )


@dataclasses.dataclass
class PhaseResult:
    state: TrainState
    best_acc: float
    steps_done: int


class PhaseTrainer:
    """Phase orchestrator.  TPU perf knobs (gin, all default off so the
    parity-tested fp32/XLA path is what configs get unless asked):

      train.compute_dtype = 'bfloat16'   # conv/matmul compute dtype
      train.fast_aspp = True             # fused Pallas ASPP fwd + VJP
                                          (measured -16% step time,
                                          benchmarks/bench_backward.py)
      train.remat = True                 # rematerialized backward —
                                          a MEMORY knob: ~time-neutral
                                          alone, but it regresses the
                                          full recipe (it recomputes
                                          the custom-VJP forward convs:
                                          45.7 vs 38.8 ms, bench_configs)
                                          so leave it off unless HBM-bound
      train.fast_gradconv = True         # shifted-matmul custom-VJP
                                          backward for the dilated
                                          layer4/5 convs (2-4x XLA's
                                          grad-conv, bench_gradconv.py)
      train.profile_steps = N            # capture one jax.profiler
                                          trace of N steady-state steps
                                          per training phase (each
                                          phase jits a different step
                                          program; the first 3 steps —
                                          compile + warmup — are
                                          skipped) to <run>/profile —
                                          open with TensorBoard/XProf
    """

    def __init__(self, model, spec, variant: str, model_dir: str,
                 hparams: Dict, logger=None, mesh=None, log=print):
        self.remat = bool(configlib.query("train", "remat", False))
        self.profile_steps = int(
            configlib.query("train", "profile_steps", 0) or 0)
        self._profiled = False
        dt_name = configlib.query("train", "compute_dtype", None)
        fast = bool(configlib.query("train", "fast_aspp", False))
        fast_gc = bool(configlib.query("train", "fast_gradconv", False))
        if dt_name or fast or fast_gc:
            repl = {}
            if dt_name:
                repl["dtype"] = {"bfloat16": jnp.bfloat16,
                                 "float32": jnp.float32}[dt_name]
            brepl = dict(repl)
            if fast_gc and hasattr(model.backbone, "fast_gradconv"):
                brepl["fast_gradconv"] = True
            if fast and hasattr(model.backbone, "fast_aspp"):
                # the fused kernel computes in bf16 and the ASPP module
                # only takes the fast branch at dtype==bfloat16
                # (models/deeplab.py) — without it the flag is inert
                from scaleprotoseg_tpu.models.unet import UNetASPP
                eff_dtype = brepl.get("dtype", model.backbone.dtype)
                if isinstance(model.backbone, UNetASPP):
                    # full-resolution shallow-C ASPP head: the Pallas
                    # forward loses there (halo re-read + 128-lane C
                    # pad, +8 ms/step at EM) and the packed backward
                    # measures neutral vs XLA AD (r5 A/B: 79.1 vs
                    # 79.2 ms with the hybrid VJP) — the knob buys
                    # nothing for this backbone, so it stays off
                    log("train.fast_aspp: disabled for UNet-ASPP "
                        "(measured neutral-to-worse at full-res "
                        "shallow-C heads — benchmarks/README.md)")
                elif eff_dtype == jnp.bfloat16:
                    brepl["fast_aspp"] = True
                else:
                    log("WARNING: train.fast_aspp=True requires "
                        "train.compute_dtype='bfloat16' — the fused "
                        "ASPP kernel stays DISABLED (XLA path)")
            model = dataclasses.replace(
                model, **repl,
                backbone=dataclasses.replace(model.backbone, **brepl))
            log(f"TPU perf knobs: compute_dtype={dt_name or 'default'} "
                f"fast_aspp={brepl.get('fast_aspp', False)} "
                f"fast_gradconv={brepl.get('fast_gradconv', False)} "
                f"remat={self.remat}")
        self.model = model
        self.spec = spec
        self.variant = variant
        self.model_dir = model_dir
        self.checkpoints_dir = os.path.join(model_dir, "checkpoints")
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        self.hp = hparams
        self.logger = logger or MetricsLogger(model_dir)
        self.mesh = mesh if mesh is not None else create_mesh()
        self.log = log
        self.best_acc = 0.0
        # multi-process (multi-host): every process runs the identical
        # loop on replicated state — msgpack checkpoint/metric FILES are
        # written by process 0 only (shared filesystem assumed, as for
        # data); the async Orbax state save stays on ALL processes (it
        # is a collective and deadlocks if gated to one process).
        # Loaders come host-sharded from cli_common.
        self.is_main = jax.process_index() == 0

    # ------------------------------------------------------------------
    def stage_key(self, phase: int) -> str:
        base = {0: "warmup", 1: "nopush", 2: "push"}[min(phase, 2)]
        return base + ("-group" if self.variant == "group" else "")

    def _avg_dist_proto(self, params) -> float:
        """Per-scale mean pairwise prototype distance
        (ref module_multiscale.py:380-388; squared-L2 per helpers.py)."""
        p = params["prototype_vectors"]
        total = 0.0
        for lo, hi in self.spec.scale_bounds:
            ps = p[lo:hi]
            total += float(jnp.mean(pairwise_l2(ps, ps))) / \
                self.spec.num_scales
        return total

    # ------------------------------------------------------------------
    def run_phase(self, variables: Dict, phase: int, max_steps: int,
                  train_loader, val_loader,
                  early_stopping_patience: Optional[int] = None,
                  val_every_steps: Optional[int] = None,
                  limit_val_batches: Optional[int] = None,
                  global_step0: int = 0, resume: bool = True) -> PhaseResult:
        hp = self.hp
        variant = self.variant
        iter_size = int(hp["iter_size"])
        groups = phase_groups(variant, phase, hp["hp"],
                              joint_last=hp["joint_last"],
                              joint_no_proto=hp["joint_no_proto"],
                              has_scale_head=self.model.scale_head_type
                              is not None)
        trainable, _ = partition_params(variables["params"], set(groups))
        schedule = poly_schedule(hp["poly_lr_power"],
                                 max(max_steps // iter_size, 1)) \
            if phase == 1 else None
        tx = make_phase_optimizer(groups, label_params(trainable),
                                  schedule=schedule, iter_size=iter_size,
                                  guard_nonfinite=50)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats"),
                                  tx.init(trainable))

        # Mid-phase resume: restore the full train state (incl. optimizer
        # moments) from the phase's Orbax state dir if one exists.
        state_dir = os.path.join(self.checkpoints_dir,
                                 f"{self.stage_key(phase)}_state")
        val_every = val_every_steps or max(len(train_loader), 1)
        steps0 = 0
        restored = None
        if resume:
            try:
                from scaleprotoseg_tpu.checkpoints.orbax_io import \
                    restore_train_state
                restored = restore_train_state(state_dir, state)
            except Exception as e:  # pragma: no cover
                self.log(f"Resume skipped ({e})")
        if restored is not None:
            # the state IS restored from here on: later best-effort steps
            # get their own guards so a failure can't mislabel the run as
            # "Resume skipped" while continuing from the restored step
            from scaleprotoseg_tpu.parallel import replicate
            state = jax.device_put(restored, replicate(self.mesh))
            steps0 = int(state.step)
            # best-checkpoint tracking survives the restart: a fresh
            # trainer's best_acc=0 would let the first post-resume
            # validation overwrite {stage}_best with a worse checkpoint
            try:
                best_path = os.path.join(
                    self.checkpoints_dir,
                    f"{self.stage_key(phase)}_best.ckpt.json")
                if os.path.exists(best_path):
                    import json
                    with open(best_path) as f:
                        prev = json.load(f).get("extra", {}) \
                            .get("best_acc", 0.0)
                    self.best_acc = max(self.best_acc, float(prev))
            except Exception as e:  # pragma: no cover
                self.log(f"WARNING: best-checkpoint metadata unreadable "
                         f"({e}); tracking restarts at 0, so an early "
                         f"post-resume validation may overwrite "
                         f"{self.stage_key(phase)}_best")
            # continue the data streams instead of restarting them (exact
            # with a det_seed dataset; see data/loader.py).  The val
            # loader advances one epoch per completed validation — val
            # items draw augmentation randomness too, so skipping this
            # would validate on different crops than the straight run.
            try:
                ff = getattr(train_loader, "fast_forward", None)
                if ff is not None:
                    ff(steps0)
                vff = getattr(val_loader, "fast_forward", None)
                if vff is not None:
                    vff((steps0 // val_every) * len(val_loader))
            except Exception as e:  # pragma: no cover
                self.log(f"WARNING: loader fast-forward failed ({e}); "
                         "the data stream restarts from epoch 0 (resume "
                         "is not bit-exact)")
            self.log(f"Resumed phase {phase} at step {steps0} "
                     f"from {state_dir} (best_acc={self.best_acc:.4f})")

        train_bn = (hp["freeze_type"] == "none")
        grad_mask = (variant == "group" and phase == 1 and
                     self.model.incorrect_strength == 0)
        step_fn = make_train_step(
            self.model, self.spec, tx, set(groups), hp["weights"],
            ignore_void=hp["ignore_void_class"], train_bn=train_bn,
            grad_mask_last_group=grad_mask,
            project_group_simplex=(variant == "group"),
            remat=self.remat)
        eval_fn = make_eval_step(self.model, self.spec, hp["weights"],
                                 ignore_void=hp["ignore_void_class"])

        stage = self.stage_key(phase)
        self.log(f"PHASE {phase} ({stage}) START: {max_steps} steps, "
                 f"trainable={sorted(groups)}")

        # SIGTERM -> checkpoint -> exit 143; relaunch resumes bit-exactly
        # (train/preemption.py; multi-process saves stay collective)
        from scaleprotoseg_tpu.train.preemption import Preempted, get_guard
        preempt = get_guard(log=self.log)

        steps = steps0
        acc_train = MetricAccumulator()
        validations_without_improvement = 0
        stop = False
        profiling_until = None
        # Metric scalars stay on device and are fetched in bulk: a
        # device_get per step would serialize training on the host
        # round-trip (the step itself keeps dispatching asynchronously).
        fetcher = BulkFetcher(acc_train.update, limit=32)

        while steps < max_steps and not stop:
            for image, target in train_loader:
                if steps >= max_steps:
                    break
                batch = assemble_global_batch(
                    (np.asarray(image), np.asarray(target)), self.mesh)
                if (self.profile_steps and not self._profiled
                        and steps == steps0 + 3 and self.is_main):
                    # 3 steps in, the step_fn compile and data warmup
                    # are behind us: the trace sees steady state only
                    profiling_until = self._profile_start(steps)
                state, metrics = step_fn(state, *batch)
                fetcher.add(metrics)
                steps += 1
                if profiling_until is not None and \
                        steps >= profiling_until:
                    self._profile_stop(metrics)
                    profiling_until = None

                if preempt.should_stop(global_step0 + steps):
                    fetcher.drain()
                    from scaleprotoseg_tpu.checkpoints.orbax_io import \
                        save_train_state
                    save_train_state(
                        state_dir, state.replace(step=jnp.asarray(steps)),
                        block=True)
                    self.log(f"PREEMPTED at step {steps}: train state "
                             f"committed to {state_dir}; relaunch the "
                             "same command to resume")
                    raise Preempted(steps)

                if steps % val_every == 0 or steps >= max_steps:
                    fetcher.drain()
                    val_summary = self._validate(state, eval_fn, val_loader,
                                                 limit_val_batches)
                    train_summary = acc_train.summary()
                    # reset IN PLACE: the fetcher holds acc_train.update,
                    # so rebinding a fresh accumulator would silently
                    # send every post-first-validation train metric to a
                    # dead object (they all logged as 0)
                    acc_train.reset()
                    record = {
                        **{f"train_{k}": v for k, v in
                           train_summary.items()},
                        **{f"val_{k}": v for k, v in val_summary.items()},
                        "training_stage": float(phase),
                        "avg_dist_proto":
                            self._avg_dist_proto(state.params),
                    }
                    if self.is_main:
                        self.logger.log(record, step=global_step0 + steps)
                    val_acc = val_summary.get("accuracy", 0.0)
                    self.log(f"step {steps}/{max_steps} "
                             f"train_loss={train_summary.get('loss', 0):.4f}"
                             f" val_acc={val_acc:.4f}")

                    self._save(state, f"{stage}_last")
                    try:
                        from scaleprotoseg_tpu.checkpoints.orbax_io import \
                            save_train_state
                        # async: the directory commit overlaps the next
                        # training steps (orbax_io docstring)
                        save_train_state(
                            state_dir,
                            state.replace(step=jnp.asarray(steps)))
                    except Exception as e:  # pragma: no cover
                        self.log(f"state checkpoint skipped ({e})")
                    if val_acc > self.best_acc:
                        self.best_acc = val_acc
                        self._save(state, f"{stage}_best")
                        validations_without_improvement = 0
                    else:
                        validations_without_improvement += 1
                    if (early_stopping_patience is not None and
                            validations_without_improvement >=
                            early_stopping_patience):
                        self.log("Early stopping triggered")
                        stop = True
                        break
        if profiling_until is not None:  # phase ended mid-trace
            self._profile_stop(None)
        try:  # phase-end barrier for the async state checkpoint
            from scaleprotoseg_tpu.checkpoints.orbax_io import \
                wait_for_checkpoints
            wait_for_checkpoints()
        except Exception as e:  # pragma: no cover
            # a failed background commit means the on-disk state is
            # stale — a later resume restarts from an older step; the
            # run itself is unaffected, so log loudly and continue
            self.log(f"async state checkpoint commit FAILED ({e}) — "
                     "resume would restart from an older step")
        return PhaseResult(state=state, best_acc=self.best_acc,
                           steps_done=steps)

    # ------------------------------------------------------------------
    def _profile_start(self, steps: int):
        """``train.profile_steps = N``: one jax.profiler trace of N
        steady-state steps per phase (each phase jits a different step
        program), written to <run>/profile in XProf/TensorBoard format.
        Process 0 only; phases too short to reach steady state (<4
        steps) are skipped."""
        out = os.path.join(self.model_dir, "profile")
        try:
            jax.profiler.start_trace(out)
        except Exception as e:  # hosted platforms may not expose it
            self.log(f"profiler trace unavailable ({e})")
            self._profiled = True
            return None
        self.log(f"profiling steps {steps + 1}.."
                 f"{steps + self.profile_steps} -> {out}")
        return steps + self.profile_steps

    def _profile_stop(self, metrics):
        self._profiled = True
        try:
            if metrics is not None:
                # hosted axon: block_until_ready returns before execution
                # finishes — a small fetch is the real sync, so the trace
                # covers the full window's device work
                jax.device_get(metrics)
            jax.profiler.stop_trace()
            self.log("profiler trace written")
        except Exception as e:  # pragma: no cover
            self.log(f"profiler stop failed ({e})")

    # ------------------------------------------------------------------
    def _validate(self, state, eval_fn, val_loader,
                  limit_val_batches=None) -> Dict[str, float]:
        acc = MetricAccumulator()
        fetcher = BulkFetcher(acc.update, limit=64)
        for i, (image, target) in enumerate(val_loader):
            if limit_val_batches is not None and i >= limit_val_batches:
                break
            batch = assemble_global_batch(
                (np.asarray(image), np.asarray(target)), self.mesh)
            fetcher.add(eval_fn(state, *batch))
        fetcher.drain()
        return acc.summary()

    def _save(self, state: TrainState, name: str):
        if not self.is_main:  # params are replicated; one writer
            return
        save_checkpoint(
            os.path.join(self.checkpoints_dir, f"{name}.ckpt"),
            state.params, state.batch_stats, spec=self.spec,
            extra={"best_acc": self.best_acc, "variant": self.variant})
