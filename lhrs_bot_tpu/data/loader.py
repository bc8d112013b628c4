"""Data loading: samplers + a threaded prefetching loader.

Replaces the torch DataLoader stack of the reference (SURVEY.md §2.5):
  * process-sharded samplers (DistributedSampler parity) — each JAX process
    reads only its slice, per-epoch reshuffled by seed;
  * WeightedRandomSampler + DistributedSamplerWrapper parity for stage-3
    weighted source mixing (Dataset/utils.py:7-57);
  * InfiniteSampler for iteration-based training
    (CustomTrainer/utils/sampler.py:11-69);
  * a thread-pool loader with background prefetch — decode/augment on CPU
    threads while the TPU step runs (the H2D transfer itself happens in the
    trainer via device_put with the data-axis sharding).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class ShardedSampler:
    """Shuffled epoch sampler yielding this process's slice (DistributedSampler
    parity: pad to a multiple of world_size so all processes agree)."""

    def __init__(self, dataset_len: int, rank: int = 0, world_size: int = 1,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False):
        self.n = dataset_len
        self.rank = rank
        self.world = world_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.world
        return -(-self.n // self.world)

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if self.drop_last:
            per = self.n // self.world
            order = order[:per * self.world]
        else:
            pad = (-len(order)) % self.world
            if pad:
                order = np.concatenate([order, order[:pad]])
        return iter(order[self.rank::self.world].tolist())


class WeightedShardedSampler(ShardedSampler):
    """Weighted with-replacement sampling sharded across processes
    (WeightedRandomSampler in DistributedSamplerWrapper parity)."""

    def __init__(self, weights: Sequence[float], num_samples: int,
                 rank: int = 0, world_size: int = 1, seed: int = 0):
        super().__init__(num_samples, rank, world_size, True, seed)
        self.weights = np.asarray(weights, np.float64)
        self.weights /= self.weights.sum()

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = rng.choice(len(self.weights), size=self.n, p=self.weights)
        per = self.n // self.world
        return iter(idx[self.rank * per:(self.rank + 1) * per].tolist())

    def __len__(self) -> int:
        return self.n // self.world


class InfiniteSampler:
    """Endless shuffled index stream, rank-sliced (sampler.py:11-69)."""

    def __init__(self, dataset_len: int, rank: int = 0, world_size: int = 1,
                 shuffle: bool = True, seed: int = 0):
        self.n = dataset_len
        self.rank = rank
        self.world = world_size
        self.shuffle = shuffle
        self.seed = seed

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            order = np.arange(self.n)
            if self.shuffle:
                rng = np.random.default_rng(self.seed + epoch)
                rng.shuffle(order)
            yield from order[self.rank::self.world].tolist()
            epoch += 1


class DataLoader:
    """Minimal map-style loader: sampler → batched indices → collated batches,
    with worker threads decoding samples and a bounded prefetch queue."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable[[List[Dict]], Dict],
        sampler=None,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = sampler if sampler is not None else ShardedSampler(
            len(dataset), rank, world_size, shuffle, seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def _batched_indices(self) -> Iterator[List[int]]:
        batch: List[int] = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self) -> Iterator[Dict]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for indices in self._batched_indices():
                        if stop.is_set():
                            return
                        items = list(pool.map(
                            self.dataset.__getitem__, indices))
                        out_q.put(self.collate_fn(items))
            except Exception as exc:  # surface worker errors to the consumer
                out_q.put(exc)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
