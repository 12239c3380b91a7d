"""Pipelined streaming inference: overlap host IO with TPU compute.

Three stages run concurrently on different resources:

  1. decode/preprocess (host threads, lookahead window) — images are
     loaded+normalized ahead of need by a thread pool;
  2. device compute — jitted calls dispatch asynchronously, so the host
     keeps feeding batches while the TPU works;
  3. result fetch — completed device outputs are pulled with
     ``jax.device_get`` one pipeline slot behind dispatch, so the
     (~30 ms on the hosted tunnel) host round-trip of batch *i* hides
     under the compute of batch *i+1*.

This is the serving analog of the eval loop's BulkFetcher pattern
(`eval/miou.py`); the reference has no equivalent — its eval scripts
block on every ``.cpu()`` (`segmentation/eval_valid_multiscale.py`).

Batches are fixed-size (one compiled program): the tail is padded by
repeating the last item and trimmed after fetch.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import numpy as np


class ServingEngine:
    """Drive ``predict(batch) -> device_array`` over a stream of items.

    Args:
      predict: batched forward; must dispatch asynchronously (any jitted
        JAX callable or a loaded ``ServingModel.predict``).
      batch_size: fixed device batch (the compiled program's shape).
      preprocess: item -> (H, W, 3) float array, run in host threads.
        ``None`` means items already are arrays.
      max_inflight: dispatched-but-unfetched batches; 2 gives
        fetch(i) ∥ compute(i+1) without unbounded device memory.
      workers: preprocess thread count (this host has 1 core; IO-bound
        decode still wins from 2-4).
    """

    def __init__(self, predict: Callable[[np.ndarray], Any],
                 batch_size: int,
                 preprocess: Optional[Callable[[Any], np.ndarray]] = None,
                 max_inflight: int = 2, workers: int = 2):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.predict = predict
        self.batch_size = batch_size
        self.preprocess = preprocess
        self.max_inflight = max(1, max_inflight)
        self.workers = max(1, workers)

    def run(self, items: Iterable[Tuple[str, Any]]
            ) -> Iterator[Tuple[str, np.ndarray]]:
        """Yield ``(key, prediction)`` in input order.

        ``items`` yields (key, raw) pairs; raw goes through
        ``preprocess`` (or is used directly).  Predictions are host
        numpy arrays (first axis of the batched output, per item).
        """
        import jax

        B = self.batch_size
        prep = self.preprocess or (lambda raw: np.asarray(raw))
        inflight: deque = deque()   # (keys, n_valid, device_out)

        def flush_oldest():
            keys, n, out = inflight.popleft()
            host = np.asarray(jax.device_get(out))
            for i, key in enumerate(keys[:n]):
                yield key, host[i]

        with ThreadPoolExecutor(self.workers) as pool:
            it = iter(items)
            window: deque = deque()   # (key, future) lookahead
            lookahead = B * (self.max_inflight + 1)

            def refill():
                while len(window) < lookahead:
                    nxt = next(it, None)
                    if nxt is None:
                        return
                    key, raw = nxt
                    window.append((key, pool.submit(prep, raw)))

            refill()
            while window:
                keys, arrs = [], []
                while window and len(arrs) < B:
                    key, fut = window.popleft()
                    keys.append(key)
                    arrs.append(fut.result())
                refill()
                n_valid = len(arrs)
                while len(arrs) < B:          # tail padding
                    arrs.append(arrs[-1])
                # flush BEFORE dispatching so at most max_inflight
                # batches are device-resident, as the docstring promises
                # (the fetch of batch i-2 hides under batch i-1's compute)
                if len(inflight) >= self.max_inflight:
                    yield from flush_oldest()
                out = self.predict(np.stack(arrs))
                inflight.append((keys, n_valid, out))
            while inflight:
                yield from flush_oldest()
