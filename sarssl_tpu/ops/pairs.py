"""Microphone-pair rebatching.

Turns ``(nb, nch, ...)`` multi-channel batches into batches of 2-channel
pairs, matching the reference ``AddChToBatch`` modes
(/root/reference/code/common/utils_module.py:116-148) but vectorized
(stack + reshape, no per-item loop):

  'M'  : pair reference mic 0 with each other mic -> ``(nb*(nch-1), 2, ...)``
  'MM' : all unordered pairs                      -> ``(nb*nch*(nch-1)/2, 2, ...)``
  '1'  : identity
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mic_pair_rebatch(data: jax.Array, ch_mode: str = "M") -> jax.Array:
    nb, nch = data.shape[0], data.shape[1]
    if ch_mode == "1" or nch == 1:
        return data
    if nch == 2 and ch_mode in ("M", "MM"):
        return data  # the only pair is (0, 1): already the input layout
    if ch_mode == "M":
        ref = jnp.broadcast_to(data[:, 0:1], (nb, nch - 1) + data.shape[2:])
        oth = data[:, 1:]
        pairs = jnp.stack([ref, oth], axis=2)  # (nb, nch-1, 2, ...)
        return pairs.reshape((nb * (nch - 1), 2) + data.shape[2:])
    if ch_mode == "MM":
        ii, jj = jnp.triu_indices(nch, k=1)  # row-major (i<j) order, matches ref
        pairs = jnp.stack([data[:, ii], data[:, jj]], axis=2)  # (nb, npair, 2, ...)
        return pairs.reshape((nb * len(ii), 2) + data.shape[2:])
    raise ValueError(f"Unrecognized microphone channel mode: {ch_mode}")


def pair_unbatch(data: jax.Array, nb: int) -> jax.Array:
    """Inverse view: ``(nb*npair, ...) -> (nb, npair, ...)``."""
    npair = data.shape[0] // nb
    return data.reshape((nb, npair) + data.shape[1:])


def num_pairs(nch: int, ch_mode: str = "M") -> int:
    if ch_mode == "1" or nch == 1:
        return 1
    if ch_mode == "M":
        return nch - 1
    if ch_mode == "MM":
        return nch * (nch - 1) // 2
    raise ValueError(f"Unrecognized microphone channel mode: {ch_mode}")


def pairwise_tdoa(tdoa_ref: jax.Array, nch: int, ch_mode: str = "M") -> jax.Array:
    """Expand per-mic TDOAs vs mic 0 into per-pair TDOAs in pair order.

    tdoa_ref: (nb, nch-1) — arrival delay of mic k vs mic 0 (annotation
    convention, data/annotations.py tdoa_from_geometry). Returns (nb, npair)
    where pair order matches :func:`mic_pair_rebatch`: 'M' is (0,k) for
    k=1..nch-1 (identity), 'MM' is upper-triangular (i<j) with
    tdoa(i,j) = t_j - t_i and t_0 = 0.
    """
    nb = tdoa_ref.shape[0]
    t = jnp.concatenate([jnp.zeros((nb, 1), tdoa_ref.dtype),
                         tdoa_ref[:, :nch - 1]], axis=1)
    if ch_mode == "M" or nch == 2:
        return t[:, 1:]
    if ch_mode == "MM":
        import numpy as _np
        ii, jj = _np.triu_indices(nch, k=1)
        return t[:, jj] - t[:, ii]
    raise ValueError(f"Unrecognized microphone channel mode: {ch_mode}")
