"""Direct-path inter-channel phase difference (DPIPD) templates.

Equivalent of reference ``DPIPD`` (/root/reference/code/common/utils_module.py:374-463):
build the complex IPD template over a DOA candidate grid for a mic geometry,
and evaluate IPDs for given source DOAs — vectorized (no per-mic-pair Python
loops) and as pure functions.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pair_adjust(data: jax.Array, ch_mode: str) -> jax.Array:
    """(..., nmic, nmic) -> (..., nmic-1) ['M'] or (..., nmic(nmic-1)/2) ['MM']."""
    nmic = data.shape[-1]
    if ch_mode == "M":
        return data[..., 0, 1:]
    if ch_mode == "MM":
        ii, jj = np.triu_indices(nmic, k=1)
        return data[..., ii, jj]
    raise ValueError(ch_mode)


def dpipd_template(mic_location, ndoa_candidate: Tuple[int, int] = (37, 73),
                   nf: int = 257, fre_max: float = 8000.0,
                   ch_mode: str = "M", speed: float = 343.0):
    """Returns (template (nele, nazi, nf, npair) complex64,
    (ele_candidates, azi_candidates))."""
    mic = jnp.asarray(mic_location, jnp.float32)
    nmic = mic.shape[0]
    nele, nazi = ndoa_candidate
    ele = jnp.linspace(0, jnp.pi, nele)
    azi = jnp.linspace(-jnp.pi, jnp.pi, nazi)
    fre = jnp.linspace(0.0, fre_max, nf)

    r = jnp.stack([
        jnp.outer(jnp.sin(ele), jnp.cos(azi)),
        jnp.outer(jnp.sin(ele), jnp.sin(azi)),
        jnp.broadcast_to(jnp.cos(ele)[:, None], (nele, nazi)),
    ], axis=-1)  # (nele, nazi, 3)

    # ITD[m1, m2] = r . (mic[m2] - mic[m1]) / c
    dvec = mic[None, :, :] - mic[:, None, :]          # (nmic, nmic, 3)
    itd = jnp.einsum("eak,mnk->eamn", r, -dvec) / speed  # r.(m2-m1): note sign
    itd = -itd
    ipd = (-2 * jnp.pi) * fre[None, None, :, None, None] * \
        itd[:, :, None, :, :]                          # (nele,nazi,nf,nmic,nmic)
    template = jnp.exp(1j * ipd)
    return _pair_adjust(template, ch_mode), (ele, azi)


def dpipd_for_doa(source_doa, mic_location, nf: int = 257,
                  fre_max: float = 8000.0, ch_mode: str = "M",
                  speed: float = 343.0) -> jax.Array:
    """IPD for given DOAs.

    source_doa: (nb, ntime, 2, nsrc) [ele, azi] radians.
    Returns (nb, ntime, nf, npair, nsrc) complex64.
    """
    mic = jnp.asarray(mic_location, jnp.float32)
    doa = jnp.moveaxis(jnp.asarray(source_doa), 2, -1)  # (nb, nt, nsrc, 2)
    fre = jnp.linspace(0.0, fre_max, nf)
    r = jnp.stack([
        jnp.sin(doa[..., 0]) * jnp.cos(doa[..., 1]),
        jnp.sin(doa[..., 0]) * jnp.sin(doa[..., 1]),
        jnp.cos(doa[..., 0]),
    ], axis=-1)  # (nb, nt, nsrc, 3)
    dvec = mic[:, None, :] - mic[None, :, :]  # (m1 - m2): matches reference :436
    itd = jnp.einsum("btsk,mnk->btsmn", r, dvec) / speed
    # reference multiplies by an extra (-1) (utils_module.py:438)
    ipd = 2 * jnp.pi * fre[None, None, None, :, None, None] * \
        itd[:, :, :, None, :, :]
    dp = jnp.exp(1j * ipd)  # (nb, nt, nsrc, nf, nmic, nmic)
    dp = _pair_adjust(dp, ch_mode)  # (nb, nt, nsrc, nf, npair)
    return jnp.moveaxis(dp, 2, -1)  # (nb, nt, nf, npair, nsrc)
