"""Multi-process prefetch loader — the production-scale input pipeline.

``ProcessPrefetchLoader`` decodes/augments samples in a pool of WORKER
PROCESSES (spawn context, so the jax/TPU-initialized parent is never
forked) and yields collated numpy batches with the same contract as the
threaded ``PrefetchLoader`` (data/loader.py).  This is the replacement
for torch ``DataLoader(num_workers=N)`` in the reference
(basicsr/data/__init__.py:87-101): GIL-free parallelism for datasets
whose per-sample cost is Python-bound (voxel packing, h5/np decode,
augmentation), where the thread pool stops scaling.

Dispatch is windowed: at most ``prefetch_batches`` batches of samples are
in flight, so result memory is bounded no matter how slow the consumer
is (torch's ``prefetch_factor`` semantics).  The pool persists across
epochs — spawn+import cost (~seconds per worker: jax re-imports under
``JAX_PLATFORMS=cpu``) is paid once per loader, not per epoch.

Select it from a reference-style dataset option dict with
``prefetch_mode: process`` (the reference's ``cpu``/``cuda`` modes map to
the threaded loader + device prefetch, COMPONENTS.md §prefetchers).

Spawn caveat (same as torch DataLoader on Windows/macOS): the entry
script that constructs this loader must be import-safe — worker spawn
re-imports ``__main__``, so a guard-less script that trains at module
scope would recursively relaunch itself.  ``python -m refid_tpu.cli.*``
entry points are all guarded.
"""

from __future__ import annotations

import atexit
from collections import deque
from typing import Iterator, Optional

from refid_tpu.data.loader import EnlargedIndexSampler, collate

__all__ = ["ProcessPrefetchLoader"]

_WORKER_DATASET = None


def _init_worker(dataset):
    """Pool initializer: each spawned worker holds one dataset copy."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _get_sample(idx):
    return _WORKER_DATASET[int(idx)]


class ProcessPrefetchLoader:
    """Iterate batches with worker-process sample loading.

    Same contract as ``PrefetchLoader``: ``set_epoch`` / ``__len__`` /
    ``__iter__`` yielding collated dicts.  The dataset must be picklable
    (every refid_tpu dataset is: option dicts + path lists + numpy state).
    """

    def __init__(self, dataset, batch_size: int = 1,
                 sampler: Optional[EnlargedIndexSampler] = None,
                 num_workers: int = 2, prefetch_batches: int = 2,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or EnlargedIndexSampler(
            len(dataset), 1, shuffle=False, num_shards=1, shard_index=0)
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.drop_last = drop_last
        self.epoch = 0
        self._pool = None
        atexit.register(self.close)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.sampler.epoch_indices(0))
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __iter__(self) -> Iterator[dict]:
        indices = self.sampler.epoch_indices(self.epoch)
        nb = len(self)
        if self.drop_last:
            indices = indices[:nb * self.batch_size]
        pool = self._ensure_pool()

        # windowed async dispatch: bounded in-flight results regardless
        # of consumer speed
        window = self.prefetch_batches * self.batch_size
        pending: deque = deque()
        it = iter(int(i) for i in indices)

        def fill():
            while len(pending) < window:
                try:
                    idx = next(it)
                except StopIteration:
                    return
                pending.append(pool.apply_async(_get_sample, (idx,)))

        fill()
        batch = []
        while pending:
            batch.append(pending.popleft().get())
            fill()
            if len(batch) == self.batch_size:
                yield collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield collate(batch)
