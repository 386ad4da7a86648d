"""Shared small modules."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..kernels.dropout import tpu_dropout


class Dropout(nn.Module):
    """Dropout that uses the Pallas hardware-PRNG kernel on TPU backends
    (regenerated-mask custom VJP; see kernels/dropout.py) and falls back to
    flax semantics elsewhere. Drop-in for ``nn.Dropout`` with
    ``deterministic`` passed at call time."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        return tpu_dropout(x, key, self.rate, deterministic=False)
