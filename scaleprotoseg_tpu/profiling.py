"""Profiling and timing utilities.

The reference has no profiling beyond wall-clock push logging
(SURVEY.md §5); this module is the framework's tracing harness:

- ``time_fn``: steady-state timing with correct device synchronization.
  On the hosted TPU platform ``block_until_ready`` returns before
  execution completes, so synchronization fetches a (tiny) output via
  ``jax.device_get``.
- ``trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
- ``flops_estimate``: XLA cost analysis of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def sync(x) -> None:
    """Robust device sync: fetch ONE ELEMENT of a leaf to the host.

    The slice depends on the full producing computation, so the fetch
    synchronizes it — without dragging the whole leaf through the
    hosted tunnel (~100 MB/s: syncing a raw 68 MB activation would add
    ~700 ms of pure wire time and once skewed an int8-vs-bf16 A/B by
    2x because the arms' wire bytes differed)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        leaf = leaves[0]
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 1) > 1:
            leaf = leaf.ravel()[:1]
        jax.device_get(leaf)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Returns {'mean_s', 'p50_s', 'best_s', 'iters_per_s'} for fn(*args).

    The first call compiles; ``warmup`` further calls settle caches; then
    ``iters`` calls are individually timed with device_get syncs."""
    out = fn(*args, **kwargs)
    sync(out)
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    mean = sum(times) / len(times)
    return {"mean_s": mean, "p50_s": times[len(times) // 2],
            "best_s": times[0], "iters_per_s": 1.0 / mean}


def time_fn_pipelined(fn: Callable, *args, iters: int = 10,
                      **kwargs) -> float:
    """Throughput (calls/sec) with dispatch pipelining: launch all iters,
    sync once at the end — the realistic serving pattern."""
    sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return iters / (time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (open the dir with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs of the compiled fn, or None if unavailable."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None
