"""Profiling helpers: JAX trace capture and per-step timing.

The reference's only tooling is a dormant line_profiler hook and a one-shot
FLOPs print (utils.py:75-89,367-372). Here: a context manager around
``jax.profiler`` trace capture (viewable in TensorBoard/Perfetto) and a
host-sync step timer.

Note: on tunneled TPU backends ``block_until_ready`` may not synchronize;
``sync`` fetches a scalar, which does.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion by fetching one scalar element to the host."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for everything inside the context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics with host synchronization."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> Optional[float]:
        if outputs is not None:
            sync(outputs)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {"mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3),
                "items_per_sec": float(items_per_step / t.mean())}
