"""Threaded prefetching data loader.

TPU-native replacement for torch's multiprocess DataLoader (reference:
datasets/base.py:724-743). Sample loading here is numpy I/O + light math
that releases the GIL, so a thread pool gives worker parallelism without
process-spawn overhead, and batches stay in shared memory — no pickling,
no pinned-memory dance. The training loop overlaps host batch prep with
device compute via an outstanding-futures window.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from py4cast_tpu.datasets.base import Item, ItemBatch, collate_fn

_STOP = object()


class DataLoader:
    """Iterable over ItemBatches with background prefetch.

    Each epoch re-shuffles when ``shuffle`` (seeded, epoch-salted).
    ``drop_last`` keeps batch shapes static across the epoch — one XLA
    compilation, no tail-recompiles.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        num_workers: int = 2,
        shuffle: bool = False,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]

    def _load_batch(self, indices: np.ndarray) -> ItemBatch:
        items: List[Item] = [self.dataset[int(i)] for i in indices]
        return collate_fn(items)

    def __iter__(self) -> Iterator[ItemBatch]:
        batches = self._batch_indices()
        self._epoch += 1
        if not batches:
            return iter(())
        return _PrefetchIterator(self, batches)


class _PrefetchIterator:
    def __init__(self, loader: DataLoader, batches: List[np.ndarray]):
        self.loader = loader
        self.batches = batches
        self.out: "queue.Queue" = queue.Queue(maxsize=loader.prefetch)
        self.pool = ThreadPoolExecutor(max_workers=loader.num_workers)
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._producer, daemon=True)
        self.thread.start()

    def _producer(self):
        try:
            # map() preserves order while workers load batches concurrently
            for batch in self.pool.map(self.loader._load_batch, self.batches):
                self.out.put(batch)
        except BaseException as e:  # propagate to consumer
            self.error = e
        finally:
            self.out.put(_STOP)
            self.pool.shutdown(wait=False)

    def __iter__(self):
        return self

    def __next__(self) -> ItemBatch:
        item = self.out.get()
        if item is _STOP:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item
