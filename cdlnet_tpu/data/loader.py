"""Minimal torch-free DataLoader: shuffling, batching, drop_last.

Datasets are indexable objects returning numpy arrays (C, ...) in [0, 1].
The loader stacks them into (N, C, ...) float32 batches. Epoch order is
driven by a numpy Generator reseeded per epoch for reproducibility.
"""

from __future__ import annotations

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
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
            items = [np.asarray(self.dataset[int(i)], dtype=np.float32) for i in sel]
            yield np.stack(items)
