"""Batch loader with background prefetch (replaces torch DataLoader,
reference: train.py:55-57).

Host-side: a thread pool assembles (B, T, 1, S, S) float32 batches ahead
of consumption (double-buffered), so h5 reads/resizes overlap device
compute. Device placement/sharding is the trainer's job (device_put with
a NamedSharding over the batch axis).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        shard: tuple[int, int] | None = None,
        row_shard: tuple[int, int] | None = None,
        transfer_dtype: str = "float32",
    ):
        """Per-host data sharding hooks for multi-host training (SURVEY
        section 5, 'Distributed communication backend'):

        ``row_shard=(process_index, process_count)`` — each host yields
        its ``batch_size`` rows of every GLOBAL batch (global batch =
        batch_size x process_count; the tail smaller than a global batch
        is dropped). Every host sees the SAME number of batches by
        construction — REQUIRED for multi-host training, where each
        batch is one collective step and a host with fewer steps
        deadlocks the others (observed live; see parallel/multihost.py).

        ``shard=(process_index, process_count)`` — each host reads every
        process_count-th whole batch. Hosts may get DIFFERENT batch
        counts (n_batches % process_count != 0), so this is only safe
        for independent per-host work (e.g. sharded offline eval), NOT
        for lockstep multi-host training.

        ``transfer_dtype="uint8"`` ships batches as round(x * 255)
        uint8 instead of float32 — 4x fewer host->HBM bytes on the
        transfer-bound path (and a 4x smaller (k, B, ...) scan-mode
        stack in HBM); the Trainer normalizes back to [0, 1] on device
        (train/loop.py _split_batch). Bit-faithful to the reference's
        native storage (the h5 clips ARE uint8, datasets/Shanghai.py:
        52-59) up to the post-resize requantization: antialiased
        resampling produces intermediate values, so re-rounding costs
        <= 1/510 per pixel vs the float32 wire format.
        """
        assert not (shard and row_shard), "shard and row_shard are exclusive"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.shard = shard
        self.row_shard = row_shard
        if transfer_dtype not in ("float32", "uint8"):
            raise ValueError(f"transfer_dtype must be float32|uint8, got {transfer_dtype}")
        self.transfer_dtype = transfer_dtype
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.row_shard is not None:
            return n // (self.batch_size * self.row_shard[1])
        nb = n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size
        if self.shard is not None:
            idx, cnt = self.shard
            return (nb - idx + cnt - 1) // cnt
        return nb

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.row_shard is not None:
            # this host's rows of each global batch (same seed on every
            # host -> identical `order` -> disjoint per-host rows and an
            # IDENTICAL batch count everywhere)
            pi, pc = self.row_shard
            gb = self.batch_size * pc
            for i in range(n // gb):
                g = order[i * gb : (i + 1) * gb]
                yield g[pi * self.batch_size : (pi + 1) * self.batch_size]
            return
        nb = n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size
        for i in range(nb):
            if self.shard is not None and i % self.shard[1] != self.shard[0]:
                continue
            yield order[i * self.batch_size : (i + 1) * self.batch_size]

    def _make_batch(self, idxs) -> np.ndarray:
        clips = [self.dataset[int(i)] for i in idxs]
        batch = np.stack(clips)[:, :, None]  # (B, T, 1, S, S)
        if self.transfer_dtype == "uint8":
            return np.clip(np.rint(batch * 255.0), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(batch, np.float32)

    def __iter__(self) -> Iterator[np.ndarray]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches())

        def worker():
            for idxs in batches:
                q.put(self._make_batch(idxs))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b


def device_prefetch(iterator, put_fn, depth: int = 2):
    """Double-buffered device prefetch: keep ``depth`` batches already
    transferred (device_put/sharded by ``put_fn``) ahead of the consumer
    so host->HBM copies overlap the train step."""
    import collections

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put_fn(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put_fn(next(it)))
        except StopIteration:
            pass
        yield out
