"""Iteration-based, double-buffered train loader.

Rebuild of the reference's RandomSampler -> BatchSampler ->
IterationBasedBatchSampler -> DataLoader chain (`train.py:60-63`,
`samplers/iteration_based_batch_sampler.py:9-35`): an epoch-free infinite
batch stream with seeded shuffling, backed by a thread pool for decode/
augment and a one-deep prefetch queue so host work overlaps device steps.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class IterationBasedLoader:
    """Yields `num_iterations` batches of stacked numpy arrays."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_iterations: int,
        seed: int = 1121,
        start_iter: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        process_id: int = 0,
        process_count: int = 1,
    ):
        """batch_size is the GLOBAL batch. With process_count > 1 every
        process draws the same seeded index stream and materialises only its
        contiguous batch_size/process_count slice - the per-host feed that
        parallel.shard_batch assembles into one global array (the TPU-native
        replacement for a distributed sampler, SURVEY.md 2.9)."""
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_iterations = num_iterations
        self.start_iter = start_iter
        self.seed = seed
        # torch's num_workers=0 means "load in the main process"; the
        # thread-pool equivalent is a single worker
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_id = process_id
        self.process_count = process_count

    def _index_stream(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        epoch = 0
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            order = rng.permutation(n)
            for s in range(0, n - self.batch_size + 1, self.batch_size):
                yield order[s : s + self.batch_size], epoch
            epoch += 1

    def __len__(self):
        return self.num_iterations

    def __iter__(self):
        stream = self._index_stream()
        # skip batches consumed before start_iter (resume semantics)
        for _ in range(self.start_iter):
            next(stream)

        def make_batch(args):
            idxs, it = args
            if self.process_count > 1:
                per = self.batch_size // self.process_count
                idxs = idxs[self.process_id * per : (self.process_id + 1) * per]
            rngs = [np.random.RandomState(hash((self.seed, it, int(i))) % (2**31)) for i in idxs]
            samples = [self.dataset.get(int(i), r) for i, r in zip(idxs, rngs)]
            cols = list(zip(*samples))
            return {
                "hr": np.stack(cols[0]),
                "seg": np.stack(cols[1]),
            }

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            produced = 0
            for i in range(min(self.prefetch * self.num_workers, self.num_iterations)):
                pending.append(pool.submit(make_batch, next(stream)))
            while produced < self.num_iterations:
                batch = pending.pop(0).result()
                produced += 1
                if produced + len(pending) < self.num_iterations:
                    pending.append(pool.submit(make_batch, next(stream)))
                yield batch
