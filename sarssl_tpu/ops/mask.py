"""Vectorized random patch masking.

Replaces the reference's per-item Python loop (``PatchMask.forward``,
/root/reference/code/common/utils_module.py:255-308) with keyed-PRNG batch
sampling: one ``jax.random`` call per batch, no host round trips, fully
jit-compatible. Statistical semantics are identical: per example, exactly
``nmasked`` of ``npatch`` patches are masked uniformly without replacement
('T' mode), and one of ``nmic`` channels is chosen uniformly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

T_MODE = "T"
T1S_MODE = "T_1s"
TCLUSTER_MODE = "T_cluster"
TCLUSTER_INV_MODE = "T_cluster_inverse"
TCLUSTER2_MODE = "T_cluster2"
TF_MODE = "TF"


class PatchMask(NamedTuple):
    """Boolean masks; ``True`` means *masked*.

    patch: ``(nb, npatch)``  — which patches are masked.
    ch:    ``(nb,)`` int32   — index of the masked channel.
    idx:   ``(nb, nmasked)`` int32 — masked patch indices (ascending).
    """

    patch: jax.Array
    ch: jax.Array
    idx: jax.Array


def _cluster_patch(kp, nbatch, npatch, nmasked, clus: int,
                   grid_shape=None) -> jax.Array:
    """Boolean mask from sampled cluster starts (1-D runs, or 2-D blocks on
    ``grid_shape`` for 'TF'), trimmed/filled to exactly nmasked per row."""
    if grid_shape is None:
        nruns = (nmasked + clus - 1) // clus + 1
        starts = jax.random.randint(kp, (nbatch, nruns), 0, npatch)
        offs = jnp.arange(clus)
        cand = (starts[:, :, None] + offs[None, None, :]).reshape(nbatch, -1)
    else:
        gh, gw = grid_shape
        nruns = (nmasked + clus * clus - 1) // (clus * clus) + 1
        starts = jax.random.randint(kp, (nbatch, nruns), 0, npatch)
        di, dj = jnp.meshgrid(jnp.arange(clus), jnp.arange(clus),
                              indexing="ij")
        cand = (starts[:, :, None] + (di.ravel() * gw + dj.ravel())[None, None]
                ).reshape(nbatch, -1)
    cand = jnp.clip(cand, 0, npatch - 1)
    patch = jnp.zeros((nbatch, npatch), bool).at[
        jnp.arange(nbatch)[:, None], cand].set(True)
    csum = jnp.cumsum(patch, axis=1)
    patch = patch & (csum <= nmasked)
    deficit = nmasked - patch.sum(axis=1, keepdims=True)
    fill = (~patch) & (jnp.cumsum(~patch, axis=1) <= deficit)
    return patch | fill


def _idx_from_patch(patch: jax.Array, nmasked: int) -> jax.Array:
    idx = jnp.argsort(~patch, axis=1, stable=True)[:, :nmasked]
    return jnp.sort(idx, axis=1).astype(jnp.int32)


def gen_patch_mask(
    key: jax.Array,
    nbatch: int,
    npatch: int,
    nmasked: int,
    nmic: int = 2,
    mode: str = T_MODE,
    grid_shape=None,
) -> PatchMask:
    """Sample per-example patch and channel masks.

    'T'                : nmasked uniform w/o replacement (reference default).
    'T_1s'             : fixed block over the last quarter of frames
                         (utils_module.py:365-368).
    'T_cluster'        : contiguous runs of ~5 until nmasked reached
                         (utils_module.py:310-327).
    'T_cluster_inverse': complement of a T_cluster draw — the npatch-nmasked
                         clustered patches stay visible (utils_module.py:329-350).
    'T_cluster2'       : length-5 runs from grid-aligned starts
                         (utils_module.py:352-363).
    'TF'               : square blocks on a 2-D (nf_patches, nt_patches) grid
                         given by ``grid_shape`` (utils_module.py:281-303).
    """
    kp, kc = jax.random.split(key)
    ch = jax.random.randint(kc, (nbatch,), 0, nmic, dtype=jnp.int32)

    if mode == T_MODE:
        u = jax.random.uniform(kp, (nbatch, npatch))
        # rank < nmasked  <=>  u among the nmasked smallest (ties: prob 0)
        order = jnp.argsort(u, axis=1)
        idx = jnp.sort(order[:, :nmasked], axis=1).astype(jnp.int32)
        patch = jnp.zeros((nbatch, npatch), bool).at[
            jnp.arange(nbatch)[:, None], idx
        ].set(True)
    elif mode == T1S_MODE:
        start = npatch - npatch // 4
        idx = jnp.broadcast_to(
            jnp.arange(start, npatch, dtype=jnp.int32), (nbatch, npatch - start)
        )
        patch = jnp.zeros((nbatch, npatch), bool).at[:, start:].set(True)
    elif mode == TCLUSTER_MODE:
        patch = _cluster_patch(kp, nbatch, npatch, nmasked, clus=5)
        idx = _idx_from_patch(patch, nmasked)
    elif mode == TCLUSTER_INV_MODE:
        visible = _cluster_patch(kp, nbatch, npatch, npatch - nmasked, clus=5)
        patch = ~visible
        idx = _idx_from_patch(patch, nmasked)
    elif mode == TCLUSTER2_MODE:
        clus = 5
        nstarts = (nmasked + clus - 1) // clus + 1
        grid = jax.random.randint(kp, (nbatch, nstarts), 0,
                                  max(npatch // clus, 1)) * clus
        offs = jnp.arange(clus)
        cand = jnp.clip((grid[:, :, None] + offs[None, None]).reshape(
            nbatch, -1), 0, npatch - 1)
        patch = jnp.zeros((nbatch, npatch), bool).at[
            jnp.arange(nbatch)[:, None], cand].set(True)
        csum = jnp.cumsum(patch, axis=1)
        patch = patch & (csum <= nmasked)
        deficit = nmasked - patch.sum(axis=1, keepdims=True)
        fill = (~patch) & (jnp.cumsum(~patch, axis=1) <= deficit)
        patch = patch | fill
        idx = _idx_from_patch(patch, nmasked)
    elif mode == TF_MODE:
        assert grid_shape is not None, "'TF' mode needs grid_shape=(gh, gw)"
        patch = _cluster_patch(kp, nbatch, npatch, nmasked, clus=3,
                               grid_shape=grid_shape)
        idx = _idx_from_patch(patch, nmasked)
    else:
        raise ValueError(f"Unrecognized patch mode: {mode}")

    return PatchMask(patch=patch, ch=ch, idx=idx)


def expand_masks(mask: PatchMask, nmic: int):
    """Dense float indicator helpers (broadcast shapes, never materialized big).

    Returns (masked_patch, masked_ch_onehot) with shapes
    ``(nb, npatch, 1, 1, 1)`` float and ``(nb, 1, 1, 1, nmic)`` float,
    ready to broadcast against ``(nb, npatch, dpatch, nreim, nmic)``.
    """
    mp = mask.patch.astype(jnp.float32)[:, :, None, None, None]
    mc = jax.nn.one_hot(mask.ch, nmic, dtype=jnp.float32)[:, None, None, None, :]
    return mp, mc
