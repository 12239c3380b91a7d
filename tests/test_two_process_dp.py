"""Two-process (multi-host analog) rehearsal — see
tools/two_process_rehearsal.py.  Two real OS processes rendezvous via
jax.distributed.initialize (CPU backend, gloo), feed disjoint host
shards, and must reproduce the single-process run across every stage:
train loss trajectory, eval confusion matrix (bit-equal), and push
winners (orchestrate() asserts all three)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns 2 subprocesses, ~2-4 min


def test_two_process_dp_matches_single_process():
    import sys
    sys.path.insert(0, "tools")
    from two_process_rehearsal import orchestrate

    result = orchestrate()
    assert len(result["two_process"]) == 3
    assert np.isfinite(result["two_process"]).all()
