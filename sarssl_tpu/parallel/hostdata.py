"""Per-host input sharding for multi-host (pod-scale) data parallelism.

The reference feeds one process with torch DataLoader workers
(/root/reference/code/run_pretrain.py:191-199). On a TPU pod each host
process must instead read only its own slice of the corpus and contribute
its host-local batch shard to a single global ``jax.Array``:

  * :func:`shard_for_process` — deterministic strided split of a file/item
    list so every host reads a disjoint subset (same list on every host ->
    same split, no coordination traffic);
  * :func:`global_batch_from_local` — assemble the per-host ``(local_nb,
    ...)`` numpy batch into a global device array laid out by the step's
    batch sharding (``jax.make_array_from_process_local_data`` places each
    host's rows on its own devices; XLA collectives do the rest);
  * :func:`host_batch_iterator` — glue: wraps any host-local batch iterator
    into global arrays for a ``make_sharded_pretrain_step`` mesh.

Single-process (including the 8-virtual-device CPU mesh) degenerates to a
plain sharded device_put, so the same code path runs everywhere.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def shard_for_process(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> list:
    """Strided slice of ``items`` owned by this host process.

    Strided (not contiguous) so corpus-order locality (per-room, per-speaker
    trees) spreads evenly across hosts. Every host gets EXACTLY
    ``len(items) // process_count`` items — the remainder is dropped — so
    per-host batch counts always agree and no host enters a collective step
    the others will never reach.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n_common = len(items) // pc
    return list(items[pi::pc][:n_common])


def global_batch_from_local(local_batch, sharding) -> jax.Array:
    """Assemble host-local rows into one global array under ``sharding``.

    ``local_batch``: (local_nb, ...) numpy/jax array on this host; every
    host must pass the same local_nb. The global batch dimension is
    ``local_nb * process_count``.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    local = np.asarray(local_batch)
    global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    try:
        return jax.make_array_from_process_local_data(sharding, local,
                                                      global_shape)
    except Exception as e:
        # surface the contract instead of a shard-shape error deep in jax
        raise ValueError(
            f"global batch assembly failed for local shape {local.shape} x "
            f"{jax.process_count()} hosts under {sharding}: every host must "
            "contribute the SAME local_nb, divisible by its data-axis "
            f"device share ({e})") from e


def host_batch_iterator(batches: Iterable, sharding,
                        prefetch: int = 2) -> Iterator:
    """Map a host-local batch iterator to global sharded arrays with
    ``prefetch`` transfers in flight (device_put/make_array are async).
    Delegates the in-flight queue to data.prefetch.device_prefetch with a
    pod-global put."""
    from ..data.prefetch import device_prefetch

    return device_prefetch(
        batches, size=prefetch,
        put=lambda b: jax.tree.map(
            lambda a: global_batch_from_local(a, sharding), b))
