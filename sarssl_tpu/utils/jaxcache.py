"""Persistent XLA compilation cache shared by every entry point.

The axon terminal does the real TPU compile at first execution (~4-8 min
per distinct program); a box reboot wipes any in-process cache and used to
force every chain restart, bench run, and CLI invocation to pay that cost
again.  This mirrors the cache setup in ``tests/conftest.py`` so the CLIs,
``bench.py`` and ``__graft_entry__.py`` all reuse one on-disk cache
(override the location with ``SARSSL_JAX_CACHE``).

No reference counterpart: torch caches kernels in-process only
(/root/reference/code/run_pretrain.py pays cudnn autotune per run).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/sarssl_jax_cache")


def enable_persistent_cache(jax) -> str:
    """Point JAX at the shared on-disk compilation cache. Idempotent."""
    cache_dir = os.environ.get("SARSSL_JAX_CACHE", _DEFAULT)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    return cache_dir
