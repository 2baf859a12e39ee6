"""Batching + host->device prefetch.

The reference uses a single-worker torch DataLoader (num_workers=0,
train.py:218) and blocks on host voxelization every batch.  Here:

* a thread-pool loader overlaps .npy reads / normalization with compute;
* :func:`prefetch_to_device` keeps ``buffer_size`` batches in flight on the
  accelerator (double buffering host->HBM, the BASELINE.json north star),
  so the TPU never waits on the host between steps;
* when a native host voxelizer/loader is built (C++ extension,
  ``native/``), it slots in below this interface.
"""
from __future__ import annotations

import collections
import concurrent.futures as cf
import random
from typing import Iterator, Optional, Sequence

import numpy as np

import jax


def _stack(items):
    if isinstance(items[0], tuple):
        return tuple(np.stack([it[i] for it in items])
                     for i in range(len(items[0])))
    return np.stack(items)


class DataLoader:
    """Minimal epoch-based batch loader over a PointSequenceDataset.

    ``drop_last`` defaults True (deviation: torch's loader keeps the
    partial final batch) — jit requires static batch shapes, and a
    one-off partial batch would trigger a full recompile per epoch.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 0, process_index: int = 0,
                 process_count: int = 1):
        """``batch_size`` is the GLOBAL batch.  With ``process_count > 1``
        (multi-host, SURVEY §5) every process draws the same global index
        order (same seed) but materializes only its
        ``batch_size / process_count`` slice of each batch; the global
        array is assembled device-side by
        :func:`prefetch_to_device` via
        ``jax.make_array_from_process_local_data``."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            assert batch_size % process_count == 0, \
                f"global batch {batch_size} % processes {process_count} != 0"
            assert drop_last, "multi-host loading requires drop_last " \
                "(static per-host shapes)"
        self._rng = random.Random(seed)
        self._pool = (cf.ThreadPoolExecutor(num_workers)
                      if num_workers > 0 else None)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order), bs):
            idx = order[i:i + bs]
            if self.drop_last and len(idx) < bs:
                return
            if self.process_count > 1:
                # per-host slice of the global batch (row p of the 'data'
                # mesh axis lives on process p's devices)
                per = bs // self.process_count
                idx = idx[self.process_index * per:
                          (self.process_index + 1) * per]
            if self._pool is not None:
                items = list(self._pool.map(self.dataset.__getitem__, idx))
            else:
                items = [self.dataset[j] for j in idx]
            yield _stack(items)


def prefetch_to_device(iterator, buffer_size: int = 2, mesh=None,
                       sharding=None):
    """Double-buffered host->HBM streaming: keep ``buffer_size`` batches
    already transferred while the current step computes."""
    if mesh is not None and sharding is None:
        from ..parallel.mesh import batch_spec
        from jax.sharding import NamedSharding
        sharding = NamedSharding(mesh, batch_spec())

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if jax.process_count() > 1:
            # each host contributed only its slice; build the global
            # array from per-process shards (no cross-host data motion)
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= buffer_size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
