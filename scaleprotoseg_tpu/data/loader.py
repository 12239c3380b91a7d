"""Threaded prefetching batch loader.

The reference uses torch DataLoader worker processes
(`data_module.py:35-55`); here a thread pool suffices because the
augmentation stack (cv2/numpy) releases the GIL, and batches are plain
numpy so the TPU transfer happens once per batch.  Supports multi-host
sharding: each process iterates only its ``host_id``-th slice of the
shuffled index stream, so global batch = per_host_batch * num_hosts.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = False,
                 host_id: int = 0, num_hosts: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self.epoch = 0
        self._skip = 0

    def fast_forward(self, batches_done: int) -> None:
        """Position the stream as if ``batches_done`` batches were already
        drawn: sets the epoch and an in-epoch offset consumed by the next
        ``__iter__``.  With a ``det_seed`` dataset this makes a resumed
        run see exactly the batches an uninterrupted run would have."""
        n = len(self)
        self.epoch = batches_done // n
        self._skip = batches_done % n

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        if self.num_hosts > 1:
            # equal per-host shards: multi-process training runs in
            # lockstep (every step is a collective), so hosts MUST yield
            # identical batch counts and sizes.  Drop the
            # len % num_hosts tail — under shuffle the dropped items
            # rotate every epoch; unshuffled (val) loaders skip at most
            # num_hosts-1 trailing items, documented in make_loaders.
            idx = idx[:len(idx) - (len(idx) % self.num_hosts)]
        return idx[self.host_id::self.num_hosts]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        set_epoch = getattr(self.dataset, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(self.epoch)  # deterministic-augmentation stream
        indices = self._indices()
        self.epoch += 1
        skip, self._skip = self._skip, 0
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if skip:
            batches = batches[skip:]

        def load_batch(batch_idx):
            items = [self.dataset[i] for i in batch_idx]
            images = np.stack([it[0] for it in items])
            labels = np.stack([it[1] for it in items])
            return images, labels

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(load_batch, b))
            while pending:
                fut = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(load_batch, b))
                yield fut.result()
