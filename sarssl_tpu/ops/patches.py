"""Patch split / recover as pure reshapes.

The reference uses ``F.unfold``/``F.fold`` with ``kernel == stride`` (see
/root/reference/code/common/utils_module.py:175-244), which for non-overlapping
patches is exactly a block reshape. We implement it that way so XLA lowers it
to free layout changes instead of gather/scatter.

Layout conventions (identical to the reference):
  * input  ``(nb, nf, nt, nreim, nmic)`` or ``(nb, nf, nt, nch)``
  * output ``(nb, npatch, dpatch, nreim, nmic)`` / ``(nb, npatch, dpatch, nch)``
  * ``npatch`` enumerates patch positions row-major over ``(nf/pf, nt/pt)``
    (or ``(nt/pt, nf/pf)`` when ``f_first=True``); ``dpatch`` enumerates
    within-patch elements row-major over ``(pf, pt)`` (or ``(pt, pf)``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _split4(data, pf, pt, swap):
    nb, nf, nt, nch = data.shape
    if swap:
        data = jnp.swapaxes(data, 1, 2)  # (nb, nt, nf, nch)
        nf, nt = nt, nf
        pf, pt = pt, pf
    x = jnp.transpose(data, (0, 3, 1, 2))  # (nb, nch, nf, nt)
    x = x.reshape(nb, nch, nf // pf, pf, nt // pt, pt)
    x = jnp.transpose(x, (0, 2, 4, 3, 5, 1))  # (nb, nfb, ntb, pf, pt, nch)
    return x.reshape(nb, (nf // pf) * (nt // pt), pf * pt, nch)


def patch_split(data: jax.Array, patch_shape, f_first: bool = False) -> jax.Array:
    """Split TF maps into non-overlapping patches.

    Args:
      data: ``(nb, nf, nt, nreim, nmic)`` or ``(nb, nf, nt, nch)``.
      patch_shape: ``(pf, pt)``.
    Returns:
      ``(nb, npatch, dpatch, nreim, nmic)`` / ``(nb, npatch, dpatch, nch)``.
    """
    pf, pt = patch_shape
    if data.ndim == 4:
        return _split4(data, pf, pt, f_first)
    nb, nf, nt, nreim, nmic = data.shape
    flat = data.reshape(nb, nf, nt, nreim * nmic)
    out = _split4(flat, pf, pt, f_first)
    return out.reshape(nb, out.shape[1], out.shape[2], nreim, nmic)


def _recover4(vec, output_shape, pf, pt, swap):
    nb, npatch, dpatch, nch = vec.shape
    nf, nt = output_shape
    if swap:
        nf, nt = nt, nf
        pf, pt = pt, pf
    nfb, ntb = nf // pf, nt // pt
    x = vec.reshape(nb, nfb, ntb, pf, pt, nch)
    x = jnp.transpose(x, (0, 5, 1, 3, 2, 4))  # (nb, nch, nfb, pf, ntb, pt)
    x = x.reshape(nb, nch, nf, nt)
    x = jnp.transpose(x, (0, 2, 3, 1))  # (nb, nf, nt, nch)
    if swap:
        x = jnp.swapaxes(x, 1, 2)
    return x


def patch_recover(vec: jax.Array, output_shape, patch_shape, f_first: bool = False) -> jax.Array:
    """Inverse of :func:`patch_split`.

    Args:
      vec: ``(nb, npatch, dpatch, nreim, nmic)`` or ``(nb, npatch, dpatch, nch)``.
      output_shape: ``(nf, nt)``.
    Returns:
      ``(nb, nf, nt, nreim, nmic)`` / ``(nb, nf, nt, nch)``.
    """
    pf, pt = patch_shape
    if vec.ndim == 4:
        return _recover4(vec, output_shape, pf, pt, f_first)
    nb, npatch, dpatch, nreim, nmic = vec.shape
    flat = vec.reshape(nb, npatch, dpatch, nreim * nmic)
    out = _recover4(flat, output_shape, pf, pt, f_first)
    return out.reshape(nb, out.shape[1], out.shape[2], nreim, nmic)
