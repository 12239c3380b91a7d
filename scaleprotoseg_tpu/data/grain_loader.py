"""Grain-backed batch loader (drop-in alternative to ``loader.DataLoader``).

The reference feeds torch ``DataLoader`` worker processes
(`data_module.py:35-55`); this repo's default is the threaded prefetcher
in ``loader.py`` (the cv2/numpy augmentation stack releases the GIL, so
threads saturate one host core).  This module offers the same loader
contract on top of `grain <https://github.com/google/grain>`_ — the
JAX-ecosystem input pipeline — for hosts where its machinery pays:

- ``grain.MapDataset.source(...)`` over the SAME per-epoch index
  permutation the threaded loader draws (``random.Random(seed+epoch)``,
  then the equal-per-host shard trim), so in ``det_seed`` mode the two
  backends yield bit-identical batch streams — switching backends never
  changes a training trajectory;
- threaded read + prefetch via ``to_iter_dataset(ReadOptions)``;
- optional PROCESS workers (``use_processes=True`` →
  ``mp_prefetch``) for augmentations that do not release the GIL —
  the one thing the threaded loader cannot do;
- ``fast_forward`` resume and ``set_epoch`` det-seed semantics exactly
  as ``loader.DataLoader`` (train/preemption.py contract).

Select per-run with gin::

    PatchClassificationDataModule.loader_backend = 'grain'

(default ``'threads'``; ``cli_common.make_loaders`` dispatches).

Measured on this 1-core host (``bench_input.py``): grain 82.9 img/s vs
the threaded default's 107.4 at the train shapes — the fastaug stack
releases the GIL, so threads win here and stay the default; both
exceed the 46.6 img/s one chip's train step consumes.  Choose grain
when the augmentation holds the GIL (process workers) or to splice
this data path into a grain-based pipeline.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from scaleprotoseg_tpu.data.loader import DataLoader


class GrainDataLoader(DataLoader):
    """``loader.DataLoader`` contract, grain execution engine.

    Inherits the index bookkeeping (``_indices``, ``__len__``,
    ``fast_forward``, epoch/seed handling) so the sampled stream is
    identical; only the read/prefetch machinery differs.
    """

    def __init__(self, *args, use_processes: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_processes = use_processes

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        import grain

        set_epoch = getattr(self.dataset, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(self.epoch)
        indices = self._indices()
        self.epoch += 1
        skip, self._skip = self._skip, 0
        if skip:
            # fast_forward: drop whole batches BEFORE building the
            # pipeline (only the final batch can be partial, so k
            # batches == k * batch_size leading items — the threaded
            # loader's batches[skip:] exactly)
            indices = indices[skip * self.batch_size:]

        dataset = self.dataset
        ds = (grain.MapDataset.source(list(indices))
              .map(lambda i: dataset[int(i)]))
        it_ds = ds.to_iter_dataset(grain.ReadOptions(
            num_threads=1 if self.use_processes else self.num_workers,
            prefetch_buffer_size=max(self.prefetch, 1) * self.batch_size))
        if self.use_processes:
            # process workers run the augmentation map; batching happens
            # AFTER (in the parent): grain's shared-memory transfer
            # needs leaf arrays per element
            it_ds = it_ds.mp_prefetch(grain.MultiprocessingOptions(
                num_workers=self.num_workers))
        it_ds = it_ds.batch(self.batch_size, drop_remainder=self.drop_last)
        # copy under mp: the batches are views of grain's shared-memory
        # blocks — copying lets the segments free as soon as the batch
        # is consumed (asarray views would pin them)
        conv = np.array if self.use_processes else np.asarray
        for images, labels in it_ds:
            yield conv(images), conv(labels)
