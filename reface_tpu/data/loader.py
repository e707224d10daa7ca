"""Prefetching host loader: dataset -> device-ready numpy batches.

Replaces the reference's PyTorch DataLoader workers (main.py:190-265,
num_workers=2*bs) with a thread-pool prefetcher that keeps the TPU fed:
CPU-side decode/augment overlaps device compute; batches are stacked
contiguous numpy, optionally double-buffered onto the device/mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

__all__ = ["PrefetchLoader", "collate"]

# process-worker plumbing: the dataset is shipped once per worker via the
# pool initializer (the reference's num_workers=2*bs DataLoader *processes*,
# main.py:190-265 — cv2/PIL decode holds the GIL, so threads can starve the
# chip at real batch sizes; see tools/bench_loader.py for measurements)
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_getitem(i):
    return _WORKER_DATASET[int(i)]


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
        process_index: int = 0,
        process_count: int = 1,
        worker_mode: str = "thread",  # "thread" | "process"
    ):
        """batch_size is the GLOBAL batch. With process_count > 1 (multi-host,
        after parallel.init_distributed) every process iterates the SAME
        shuffled order but loads only its batch_size/process_count slice of
        each batch (the DistributedSampler role, main.py:190-265 + DDP);
        shard_batch then assembles the slices into global arrays."""
        if batch_size % max(process_count, 1):
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{process_count} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.device_put = device_put
        self.process_index = process_index
        self.process_count = process_count
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        self._epoch = 0
        self._pool = None

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
        local = self.batch_size // self.process_count
        lo = self.process_index * local
        for b in range(nb):
            batch = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield batch[lo : lo + local]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # stop-aware put: the consumer may have exited (break / raise /
            # --steps reached) with the queue full — a plain blocking put
            # would hang this thread forever, pinning the pool + dataset
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                if self.worker_mode == "process":
                    # persistent pool: fork/ship the dataset once, reuse
                    # across epochs (DataLoader persistent_workers role).
                    # A pool whose worker hard-died is permanently broken —
                    # replace it here (at acquisition, not in the crash
                    # path: the consumer races ahead of producer cleanup).
                    if self._pool is not None and getattr(
                        self._pool, "_broken", False
                    ):
                        self._pool.shutdown(wait=False)
                        self._pool = None
                    if self._pool is None:
                        self._pool = ProcessPoolExecutor(
                            self.num_workers, initializer=_init_worker,
                            initargs=(self.dataset,),
                        )
                    get = _worker_getitem
                    pool = self._pool
                else:
                    pool = ThreadPoolExecutor(self.num_workers)
                    get = self.dataset.__getitem__
                try:
                    for batch_idx in self._batch_indices():
                        if stop.is_set():
                            return
                        items = list(pool.map(get, batch_idx))
                        if not _put(collate(items)):
                            return
                finally:
                    if self.worker_mode != "process":
                        pool.shutdown(wait=False)
            except BaseException as e:  # noqa: BLE001 — reraised in consumer
                # A raising __getitem__ or a hard-crashed worker process
                # (BrokenProcessPool) must fail the training loop loudly,
                # not silently end the epoch short.
                _put(e)
            finally:
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield self.device_put(batch) if self.device_put else batch
        finally:
            stop.set()

    def close(self):
        """Shut down a persistent process pool (no-op for threads)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
