"""Deterministic seeding.

The reference reseeds numpy/random/torch globals per epoch and per split
(/root/reference/code/common/utils.py:39-56, run_pretrain.py:249-260). The
TPU rebuild uses a single keyed PRNG tree instead: one root key, folded per
(purpose, epoch) so every stream is independent and reproducible without
global state.
"""
from __future__ import annotations

import random

import jax
import numpy as np

_PURPOSES = {"train": 0, "val": 1, "test": 2, "data": 3, "mask": 4, "init": 5}


def set_seed(seed: int):
    """Seed host-side RNGs (data pipeline shuffling etc.)."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


def epoch_key(root_key, purpose: str, epoch: int):
    """Independent stream per (purpose, epoch). Unknown purposes use a
    stable crc32 digest (str hash() is salted per process), offset past the
    reserved ids so custom streams cannot alias 'train'/'val'/..."""
    import zlib
    pid = _PURPOSES.get(purpose)
    if pid is None:
        pid = len(_PURPOSES) + zlib.crc32(purpose.encode()) % 991
    k = jax.random.fold_in(root_key, pid)
    return jax.random.fold_in(k, epoch)
