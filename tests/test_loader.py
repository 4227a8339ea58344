"""Threaded prefetch loader semantics: ordering, shuffling, drop_last,
error propagation (reference analog: torch DataLoader usage,
datasets/base.py:724-743)."""

import numpy as np
import pytest

from py4cast_tpu.datasets import get_datasets
from py4cast_tpu.datasets.loader import DataLoader


@pytest.fixture(scope="module")
def train_ds():
    ds, _, _ = get_datasets("dummy", 2, 1, 1)
    return ds


def _first_times(batch):
    return [vt[0] for vt in batch.validity_times]


def test_loader_covers_dataset_once(train_ds):
    loader = train_ds.loader(batch_size=8, shuffle=False)
    seen = []
    for batch in loader:
        assert batch.batch_size == 8  # drop_last keeps shapes static
        seen.extend(_first_times(batch))
    assert len(seen) == (len(train_ds) // 8) * 8
    assert len(set(seen)) == len(seen)  # no duplicates


def test_loader_shuffle_is_seeded_and_epoch_salted(train_ds):
    l1 = train_ds.loader(batch_size=8, shuffle=True, seed=7)
    e1 = [_first_times(b) for b in l1]
    e2 = [_first_times(b) for b in l1]  # second epoch reshuffles
    l2 = train_ds.loader(batch_size=8, shuffle=True, seed=7)
    e1b = [_first_times(b) for b in l2]
    assert e1 == e1b  # same seed, same first epoch
    assert e1 != e2  # epochs differ


def test_loader_propagates_worker_errors(train_ds):
    class Boom:
        settings = train_ds.settings

        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("boom")

    from py4cast_tpu.datasets.loader import DataLoader

    loader = DataLoader(Boom(), batch_size=4)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_bounds_in_flight_work(train_ds):
    """The producer must not load the whole epoch eagerly: after one
    batch is consumed, at most window (prefetch + workers) + queue
    batches may have been loaded."""
    import time

    from py4cast_tpu.datasets.loader import DataLoader

    loads = []

    class Counting:
        settings = train_ds.settings

        def __len__(self):
            return 64

        def __getitem__(self, i):
            loads.append(i)
            return train_ds[i % len(train_ds)]

    loader = DataLoader(Counting(), batch_size=4, num_workers=2, prefetch=2)
    it = iter(loader)
    next(it)
    time.sleep(0.3)  # let the producer run ahead as far as it will
    # window = prefetch + workers = 4 in-flight batches, + prefetch queued,
    # + 1 consumed → well under the 16 total batches of the epoch
    assert len(loads) <= 4 * (2 + 2 + 2 + 1 + 1)
    it.close()


def test_abandoned_loader_shuts_down(train_ds):
    """limit_train_batches-style abandonment must not leak the producer
    thread (it was previously blocked forever on queue.put)."""
    import gc
    import time

    loader = train_ds.loader(batch_size=4, num_workers=2)
    it = iter(loader)
    next(it)  # consume one, abandon the rest
    thread = it.thread
    del it
    gc.collect()
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_checkpoint_save_replaces_existing(tmp_path):
    """Atomic-replace path: overwriting `last` keeps a restorable tree."""
    from py4cast_tpu.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path, manifest={"x": 1})
    ckpt.save_last({"w": np.ones(3)})
    ckpt.save_last({"w": np.full(3, 2.0)})  # replace
    restored = ckpt.restore("last", {"w": np.empty(3)})
    np.testing.assert_array_equal(restored["w"], np.full(3, 2.0))
    leftovers = [p.name for p in tmp_path.iterdir() if p.name.startswith(".last")]
    assert leftovers == []


def test_checkpoint_best_tracks_minimum(tmp_path):
    from py4cast_tpu.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path, manifest={"x": 1})
    tree = {"w": np.ones(3)}
    assert ckpt.maybe_save_best(tree, 1.0)
    assert not ckpt.maybe_save_best(tree, 2.0)  # worse: not saved
    assert ckpt.maybe_save_best({"w": np.zeros(3)}, 0.5)
    restored = ckpt.restore("best", {"w": np.empty(3)})
    np.testing.assert_array_equal(restored["w"], np.zeros(3))
    assert ckpt.read_manifest() == {"x": 1}


class _RangeDataset:
    """Tiny fake dataset: sample i is a constant-i field."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import datetime as dt

        from py4cast_tpu.datasets.base import Item
        from py4cast_tpu.named_tensor import NamedArray

        arr = np.full((1, 2, 2, 1), float(i), np.float32)
        na = NamedArray(arr, ("timestep", "lat", "lon", "features"), ("f",))
        return Item(
            inputs=None, forcing=None, outputs=na,
            validity_times=[dt.datetime(2020, 1, 1) + dt.timedelta(hours=i)],
        )


def test_pad_last_pads_and_marks_valid_count():
    """pad_last keeps batch shapes static and exposes the real row count."""
    ds = _RangeDataset(7)
    loader = DataLoader(ds, batch_size=4, drop_last=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].batch_size == 4 and batches[0].valid_count == 4
    assert batches[1].batch_size == 4 and batches[1].valid_count == 3
    # the pad row repeats the last real sample
    np.testing.assert_array_equal(
        np.asarray(batches[1].outputs.array)[3],
        np.asarray(batches[1].outputs.array)[2],
    )


def test_drop_last_false_without_pad_yields_short_tail():
    ds = _RangeDataset(7)
    loader = DataLoader(ds, batch_size=4, drop_last=False)
    batches = list(loader)
    assert [b.batch_size for b in batches] == [4, 3]
    assert batches[0].num_valid is None  # full batch
    assert batches[1].valid_count == 3  # real (unpadded) short tail


def test_loader_process_partitioning():
    """Multi-host: each process loads a disjoint slice of every global
    batch; the union covers the epoch exactly once (the DDP-sampler
    analog, reference Lightning strategy, SURVEY.md §2.3)."""
    ds = _RangeDataset(8)
    l0 = DataLoader(ds, batch_size=4, process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=4, process_index=1, process_count=2)
    b0 = list(l0)
    b1 = list(l1)
    assert len(b0) == len(b1) == 2
    for a, b in zip(b0, b1):
        assert a.batch_size == b.batch_size == 2  # local rows
        ra = set(np.asarray(a.outputs.array).ravel()[::4])
        rb = set(np.asarray(b.outputs.array).ravel()[::4])
        assert not ra & rb  # disjoint slices
    seen = set()
    for batch in b0 + b1:
        seen |= set(float(v) for v in np.asarray(batch.outputs.array)[:, 0, 0, 0, 0])
    assert seen == set(float(i) for i in range(8))


def test_loader_process_partitioning_shuffle_consistent():
    """The seeded shuffle is identical across processes, so slices stay
    disjoint under shuffling too."""
    ds = _RangeDataset(8)
    l0 = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                    process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                    process_index=1, process_count=2)
    for a, b in zip(l0, l1):
        ra = set(np.asarray(a.outputs.array)[:, 0, 0, 0, 0].tolist())
        rb = set(np.asarray(b.outputs.array)[:, 0, 0, 0, 0].tolist())
        assert not ra & rb


def test_loader_padded_tail_partitioned():
    """Global pad + per-process slice: num_valid carries the GLOBAL real
    count so eval can drop padding regardless of which rank holds it."""
    ds = _RangeDataset(7)
    l0 = DataLoader(ds, batch_size=4, drop_last=False, pad_last=True,
                    process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=4, drop_last=False, pad_last=True,
                    process_index=1, process_count=2)
    b0 = list(l0)
    b1 = list(l1)
    assert b0[1].num_valid == 3 and b1[1].num_valid == 3
    assert b0[1].batch_size == 2 and b1[1].batch_size == 2
