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
    """Independent stream per (purpose, epoch)."""
    k = jax.random.fold_in(root_key, _PURPOSES.get(purpose, hash(purpose) % 997))
    return jax.random.fold_in(k, epoch)
