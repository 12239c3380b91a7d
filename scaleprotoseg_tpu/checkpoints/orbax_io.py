"""Orbax-backed full-train-state checkpointing (async, mid-phase resume).

The reference's only recovery path is reloading the last whole-module
pickle at phase boundaries (SURVEY.md §5 "failure detection / elastic
recovery": W&B run-resume + phase-boundary reloads).  The TPU-idiomatic
equivalent (SURVEY.md §5: "Orbax async checkpointing w/ step restore")
adds *mid-phase* resume: the complete TrainState — params, BN stats,
optimizer state (Adam moments, MultiSteps accumulators), step counter —
is checkpointed with Orbax and restored against a freshly built
template, so a preempted run continues from the last validation
boundary instead of the phase start.

Saves are asynchronous by default: ``save_train_state`` returns once
the device→host copy is staged and the directory write proceeds on
Orbax's background thread, so the training loop overlaps the disk IO
with the next steps (Orbax serializes back-to-back saves internally —
a new save first waits for the previous commit).  Call
``wait_for_checkpoints()`` at a phase end or before process exit;
``restore_train_state`` waits automatically so an in-process restore
never reads a half-committed directory.
"""

from __future__ import annotations

import os
from typing import Any, Optional

_CHECKPOINTER = None


def _checkpointer():
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_train_state(path: str, state, block: bool = False) -> None:
    """Stage + asynchronously commit the full train state to ``path``.

    ``block=True`` waits for the directory commit (tests, final save).
    Multi-process: this is a COLLECTIVE — every process must call it
    (Orbax synchronizes processes internally; gating it on process 0
    deadlocks the job at the first save barrier).  Orbax elects the
    metadata writer itself; a benign "removing existing [unfinalized]
    directory" warning can appear when force-overwriting a directory a
    previous save staged."""
    checkpointer = _checkpointer()
    path = os.path.abspath(path)
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats or {},
               "opt_state": state.opt_state}
    checkpointer.save(path, payload, force=True)
    if block:
        checkpointer.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Barrier for any in-flight async save (phase end / process exit)."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


def restore_train_state(path: str, template_state) -> Optional[Any]:
    """Restore into the structure of ``template_state``; None if absent."""
    wait_for_checkpoints()
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    checkpointer = _checkpointer()
    template = {"step": template_state.step,
                "params": template_state.params,
                "batch_stats": template_state.batch_stats or {},
                "opt_state": template_state.opt_state}
    restored = checkpointer.restore(path, template)
    return template_state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"] or
        template_state.batch_stats,
        opt_state=restored["opt_state"])
