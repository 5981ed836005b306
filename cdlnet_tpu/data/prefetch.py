"""Host->device prefetch with double buffering.

Replaces the reference's async_prefetch_to_gpu (utils.py:103-106): while the
device computes on batch i, batch i+1 is already being transferred. With a
sharding, batches land directly in their data-parallel placement.
"""

from __future__ import annotations

import collections
import itertools

import jax


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator; yields device arrays `size` steps ahead."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.device_put(batch, sharding))
        else:
            queue.append(jax.device_put(batch))

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        put(batch)
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            put(batch)
