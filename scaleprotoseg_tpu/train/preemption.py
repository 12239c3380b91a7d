"""Preemption-graceful checkpointing: SIGTERM -> save state -> exit 143.

TPU VMs (and most cluster schedulers) deliver SIGTERM shortly before
eviction.  On that signal the trainer commits a full train-state
checkpoint at the next step boundary and exits; relaunching the same
command resumes bit-exactly through the existing mid-phase resume path
(`train/runner.py` + `checkpoints/orbax_io.py`, pinned by
`tests/test_resume.py::test_exact_resume_trajectory`).

The reference has no equivalent (single-GPU Lightning run; SURVEY.md §5
lists failure detection as absent upstream — this is a new first-class
subsystem of the TPU framework).

Coordination:
- Single-process: a SIGTERM handler sets a flag that ``should_stop``
  reads once per step.
- Multi-process (multi-host): a local flag is NOT safe — the Orbax
  state save is a collective, so every process must enter it at the
  SAME step or the job deadlocks at Orbax's internal barrier.  JAX's
  preemption sync service (enabled by ``jax.distributed.initialize``
  when ``jax_enable_preemption_service`` is on, its default) propagates
  any host's SIGTERM to all hosts and agrees on a common safe step;
  ``should_stop`` returns True on every process at that step.  If the
  service is unavailable the guard disables itself rather than risk a
  desynchronized collective.
"""

from __future__ import annotations

import signal
import threading

import jax

_guard = None


class Preempted(SystemExit):
    """Raised AFTER the preemption checkpoint has committed.

    Subclasses ``SystemExit`` with code 143 (128+SIGTERM): an unhandled
    escape terminates the process the way schedulers expect, with no
    traceback, and CLI entry points need no special handling."""

    def __init__(self, step: int):
        super().__init__(143)
        self.step = step

    def __str__(self):
        return f"preempted at step {self.step} (state checkpointed)"


class PreemptionGuard:
    """Process-wide preemption detector (use :func:`get_guard`)."""

    def __init__(self, log=print):
        self._flag = False
        self._log = log
        self._multiproc = jax.process_count() > 1
        self._sync_ok = self._multiproc  # optimistic; cleared on error
        if not self._multiproc:
            if threading.current_thread() is threading.main_thread():
                self._prev = signal.getsignal(signal.SIGTERM)
                signal.signal(signal.SIGTERM, self._on_sigterm)
            else:  # pragma: no cover - signal API limit
                log("PreemptionGuard: not in the main thread; SIGTERM "
                    "graceful checkpointing disabled")

    def _on_sigterm(self, signum, frame):
        self._flag = True
        self._log("SIGTERM received: committing a state checkpoint at "
                  "the next step boundary, then exiting 143")
        # chain whatever handler was installed before us (e.g. a W&B run
        # or scheduler wrapper flushing its buffers) so installing the
        # guard never silently disables another component's cleanup
        prev = getattr(self, "_prev", None)
        if callable(prev) and prev is not signal.default_int_handler:
            prev(signum, frame)

    def should_stop(self, step: int) -> bool:
        """True exactly once training must checkpoint and exit.

        ``step`` must advance identically on every process (the runner
        passes ``global_step0 + steps``); the multi-process sync point
        uses it to pick the common safe step."""
        if self._multiproc:
            if not self._sync_ok:
                return False
            try:
                from jax.experimental import multihost_utils
                return multihost_utils.reached_preemption_sync_point(step)
            except RuntimeError as e:
                # preemption service disabled: a local flag could fire
                # on one process only and deadlock the collective save
                self._sync_ok = False
                self._log(f"PreemptionGuard disabled ({e})")
                return False
        return self._flag


def get_guard(log=print) -> PreemptionGuard:
    """The process's singleton guard (installs the handler on first use)."""
    global _guard
    if _guard is None:
        _guard = PreemptionGuard(log=log)
    return _guard
