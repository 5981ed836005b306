"""Minimal torch-free DataLoader: shuffling, batching, drop_last, and
thread-pool workers.

Datasets are indexable objects returning numpy arrays (C, ...) in [0, 1].
The loader stacks them into (N, C, ...) float32 batches. Epoch order is
driven by a numpy Generator reseeded per epoch for reproducibility.

num_workers > 0 assembles batches in a thread pool and keeps `prefetch`
batches in flight (torch-DataLoader-style surface; the reference always
ran with its default num_workers=0, data.py:47-50). Measured honestly: on
this runtime PIL's PNG decode does not release the GIL enough for thread
workers to speed up decode-bound epochs — the win is pipeline overlap: the
main thread can run device work while futures for upcoming batches are in
flight, and JAX's async dispatch already hides single-batch assembly.
Process-based workers would be the next step if host decode ever binds.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


class ThreadSafeRng:
    """Per-call child generators from one seeded root: safe under the
    DataLoader's worker threads (numpy Generators are not thread-safe; only
    the cheap spawn is serialized, so decode/augment still run in parallel).
    With num_workers > 0, augmentation draws depend on thread scheduling —
    like torch DataLoader workers, runs are not bit-reproducible."""

    def __init__(self, seed):
        import threading

        self._root = np.random.default_rng(seed)
        self._lock = threading.Lock()

    def __call__(self):
        with self._lock:
            return self._root.spawn(1)[0]

    # sequential compatibility for non-worker paths that draw directly
    def __getattr__(self, name):
        return getattr(self._root, name)


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 seed=0, num_workers=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self._epoch = 0
        self._pool = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            sel = idx[start : start + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            yield sel

    def _assemble(self, sel):
        items = [np.asarray(self.dataset[int(i)], dtype=np.float32) for i in sel]
        return np.stack(items)

    def __iter__(self):
        if self.num_workers <= 0:
            for sel in self._batches():
                yield self._assemble(sel)
            return
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            # the pool persists across epochs; release its threads when the
            # loader is collected (nothing else ever shuts it down)
            import weakref

            weakref.finalize(self, self._pool.shutdown, wait=False)
        pending = []
        batches = self._batches()
        try:
            for sel in batches:
                pending.append(self._pool.submit(self._assemble, sel))
                if len(pending) > self.prefetch:
                    yield pending.pop(0).result()
            while pending:
                yield pending.pop(0).result()
        finally:
            for f in pending:  # consumer stopped early: don't leak work
                f.cancel()
