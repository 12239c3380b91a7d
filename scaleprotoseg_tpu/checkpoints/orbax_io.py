"""Orbax-backed full-train-state checkpointing (mid-phase resume).

The reference's only recovery path is reloading the last whole-module
pickle at phase boundaries (SURVEY.md §5 "failure detection / elastic
recovery": W&B run-resume + phase-boundary reloads).  The TPU-idiomatic
equivalent adds *mid-phase* resume: the complete TrainState — params,
BN stats, optimizer state (Adam moments, MultiSteps accumulators), step
counter — is checkpointed with Orbax and restored against a freshly
built template, so a preempted run continues from the last validation
boundary instead of the phase start.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_train_state(path: str, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats or {},
               "opt_state": state.opt_state}
    checkpointer.save(path, payload, force=True)
    checkpointer.wait_until_finished()


def restore_train_state(path: str, template_state) -> Optional[Any]:
    """Restore into the structure of ``template_state``; None if absent."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    checkpointer = ocp.StandardCheckpointer()
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
