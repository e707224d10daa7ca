"""Prefetching host loader: dataset -> device-ready numpy batches.

Replaces the reference's PyTorch DataLoader workers (main.py:190-265,
num_workers=2*bs) with a thread-pool prefetcher that keeps the TPU fed:
CPU-side decode/augment overlaps device compute; batches are stacked
contiguous numpy, optionally double-buffered onto the device/mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

__all__ = ["PrefetchLoader", "collate"]


def collate(items: Sequence[dict]) -> dict:
    out = {}
    for k in items[0]:
        out[k] = np.stack([it[k] for it in items])
    return out


class PrefetchLoader:
    """Iterates batches with background workers and a bounded prefetch queue.

    device_put: optional callable (e.g. functools.partial(shard_batch,
    mesh=mesh)) applied to each batch on the consumer thread.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
        device_put=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.device_put = device_put
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])
            )
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for batch_idx in self._batch_indices():
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        q.put(collate(items))
                finally:
                    q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield self.device_put(batch) if self.device_put else batch
        finally:
            stop.set()
