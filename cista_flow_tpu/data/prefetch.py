"""Host→device prefetching for input pipelines.

Keeps ``size`` batches in flight: the host thread decodes/stacks the next
batches (threaded loader) while the device executes the current step —
device transfers are async in JAX, so simply issuing ``device_put`` ahead of
time overlaps H2D copies with compute.
"""
from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    put: Callable | None = None) -> Iterator:
    """Yield device-resident items while keeping ``size`` in flight.

    put: optional transfer fn (e.g. ``lambda b: parallel.shard_seq_batch(
    b, mesh)``); defaults to ``jax.device_put`` on pytrees.
    """
    if put is None:
        put = jax.device_put
    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
