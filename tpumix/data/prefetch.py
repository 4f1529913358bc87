"""Batch assembly and host->device prefetching.

The reference feeds training through ``torch.utils.data.DataLoader`` with 6
worker processes + pinned memory (reference training.ipynb cell 6,
model_scalar_1s.py:291-297).  The TPU equivalent here is a lightweight
batcher plus a background-thread prefetcher that overlaps disk I/O / batch
assembly with device compute and stages the next batch on device ahead of
time (double buffering), so the chip never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class BatchIterator:
    """Shuffled epoch iterator over a map-style dataset, yielding stacked
    numpy batches.  ``drop_last`` keeps shapes static for jit."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: Optional[int] = None,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index``: multi-host data sharding — every
        process builds the iterator with the SAME seed and its own index, the
        shuffled epoch order is identical everywhere (seeded host RNG), and
        each process yields the disjoint strided slice ``order[index::num]``
        (the DistributedSampler pattern; pairs with
        tpumix.parallel.distributed.global_batch so ``batch_size`` stays the
        PER-PROCESS size)."""
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} outside [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._rng = np.random.default_rng(seed)

    def _shard_len(self) -> int:
        # floor division keeps every shard the same length (static shapes
        # across processes — a straggler shard would deadlock collectives)
        return len(self.dataset) // self.num_shards if self.num_shards > 1 else len(self.dataset)

    def __len__(self) -> int:
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_index :: self.num_shards][: self._shard_len()]
        stop = len(self) * self.batch_size if self.drop_last else len(order)
        for lo in range(0, stop, self.batch_size):
            idxs = order[lo : lo + self.batch_size]
            items = [self.dataset[int(i)] for i in idxs]
            yield tuple(np.stack(parts) for parts in zip(*items))


def prefetch_to_device(
    iterator,
    size: int = 2,
    device=None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Wrap a host batch iterator with a background thread that stages the
    next ``size`` batches on device (jax.device_put) while the current step
    runs.  ``transform`` runs on the host thread before transfer."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def producer():
        try:
            for batch in iterator:
                if transform is not None:
                    batch = transform(batch)
                q.put(jax.device_put(batch, device))
            q.put(_END)
        except BaseException as e:  # surface worker errors in the consumer
            q.put((_ERR, e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
