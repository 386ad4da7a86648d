"""Host->device prefetch: overlap input transfer with the running step.

Replaces DataLoader pin_memory/workers semantics (reference
run_pretrain.py:191-199) the TPU way: while step N executes, batch N+1 is
already being copied to HBM (device_put is async in JAX), so steps never
stall on host->device transfer.
"""
from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(batches: Iterable, size: int = 2,
                    sharding: Optional[object] = None,
                    put=None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` in flight.

    ``put`` overrides the per-batch transfer (e.g. pod-global batch
    assembly in parallel/hostdata.py); default is a (sharded) device_put.
    """
    assert size >= 1, f"prefetch size {size} would drop every batch"
    queue = collections.deque()

    if put is None:
        def put(x):
            if sharding is not None:
                return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
            return jax.tree.map(jax.device_put, x)

    it = iter(batches)
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
