"""Host-side data loading: sampler + threaded prefetch loader.

Replaces torch DataLoader + EnlargedSampler + CPU/CUDA prefetchers
(basicsr/data/__init__.py:62-125, data_sampler.py, prefetch_dataloader.py):

  * ``EnlargedIndexSampler`` — epoch-seeded permutation over ``ratio``-fold
    dataset enlargement, sliced per JAX process (replaces rank logic).
  * ``PrefetchLoader`` — a thread pool decodes/augments samples ahead of the
    training loop (cv2/numpy release the GIL) and collates numpy batches;
    device transfer is the trainer's job (jax.device_put with sharding).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

import jax

from refid_tpu.core.registry import DATASETS

__all__ = ["build_dataset", "build_loader", "EnlargedIndexSampler",
           "PrefetchLoader", "collate"]


def build_dataset(dataset_opt: dict):
    cls = DATASETS.get(dataset_opt["type"])
    return cls(dataset_opt)


class EnlargedIndexSampler:
    """Epoch-seeded shuffled indices, dataset enlarged ``ratio``-fold
    (data_sampler.py:6-51), sliced by process for multi-host input."""

    def __init__(self, num_samples: int, ratio: int = 1, shuffle: bool = True,
                 num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None, seed: int = 0):
        self.num_samples = num_samples
        self.total = int(num_samples * max(ratio, 1))
        self.shuffle = shuffle
        self.num_shards = num_shards or jax.process_count()
        self.shard_index = (shard_index if shard_index is not None
                            else jax.process_index())
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            idx = rng.permutation(self.total) % self.num_samples
        else:
            idx = np.arange(self.total) % self.num_samples
        # interleaved subsampling, matching the reference
        # (data_sampler.py:42 ``indices[rank:total_size:num_replicas]``):
        # shard k takes every num_shards-th index.  With per-process
        # loaders this makes the multi-process GLOBAL batch equal the
        # single-process batch as a set, so losses match exactly
        # (tests/test_multihost.py).
        per = self.total // self.num_shards
        return idx[:per * self.num_shards][self.shard_index::self.num_shards]


def collate(samples: list) -> dict:
    """Stack numeric fields into a batch dim; string fields -> lists."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class PrefetchLoader:
    """Iterate batches with background-thread sample loading."""

    def __init__(self, dataset, batch_size: int = 1,
                 sampler: Optional[EnlargedIndexSampler] = None,
                 num_workers: int = 2, prefetch_batches: int = 2,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or EnlargedIndexSampler(
            len(dataset), 1, shuffle=False, num_shards=1, shard_index=0)
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.sampler.epoch_indices(0))
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self.sampler.epoch_indices(self.epoch)
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            [int(i) for i in batch_idx]))
                    q.put(collate(samples))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def build_loader(dataset, dataset_opt: dict, is_train: bool,
                 seed: int = 0) -> PrefetchLoader:
    """Build from a reference-style dataset option dict
    (data/__init__.py:62-125 semantics: train uses per-device batch size x
    local device count, val/test uses batch 1, no shuffling)."""
    if is_train:
        batch = dataset_opt.get("batch_size_per_gpu", 1) * jax.local_device_count()
        sampler = EnlargedIndexSampler(
            len(dataset), dataset_opt.get("dataset_enlarge_ratio", 1),
            shuffle=dataset_opt.get("use_shuffle", True), seed=seed)
        workers = dataset_opt.get("num_worker_per_gpu", 2)
        cls = PrefetchLoader
        if dataset_opt.get("prefetch_mode") == "process":
            # GIL-free worker processes (mp_loader.py) — the torch
            # DataLoader(num_workers=N) analog for Python-bound decodes
            from refid_tpu.data.mp_loader import ProcessPrefetchLoader
            cls = ProcessPrefetchLoader
        return cls(dataset, batch, sampler, workers,
                   prefetch_batches=dataset_opt.get(
                       "num_prefetch_queue", 2), drop_last=True)
    sampler = EnlargedIndexSampler(len(dataset), 1, shuffle=False,
                                   num_shards=1, shard_index=0)
    return PrefetchLoader(dataset, 1, sampler, num_workers=1,
                          prefetch_batches=1, drop_last=False)
