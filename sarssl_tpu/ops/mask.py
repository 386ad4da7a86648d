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


class PatchMask(NamedTuple):
    """Boolean masks; ``True`` means *masked*.

    patch: ``(nb, npatch)``  — which patches are masked.
    ch:    ``(nb,)`` int32   — index of the masked channel.
    idx:   ``(nb, nmasked)`` int32 — masked patch indices (ascending).
    """

    patch: jax.Array
    ch: jax.Array
    idx: jax.Array


def gen_patch_mask(
    key: jax.Array,
    nbatch: int,
    npatch: int,
    nmasked: int,
    nmic: int = 2,
    mode: str = T_MODE,
) -> PatchMask:
    """Sample per-example patch and channel masks.

    'T'        : nmasked uniform w/o replacement (reference default).
    'T_1s'     : fixed block covering the last 64 frames (frames 192..255
                 for npatch=256; generally the last quarter), reference
                 utils_module.py:365-368.
    'T_cluster': contiguous runs of length ~5 until nmasked reached
                 (approximated by sampling run starts; statistically matches
                 utils_module.py:310-327).
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
        clus = 5
        nruns = (nmasked + clus - 1) // clus + 1
        starts = jax.random.randint(kp, (nbatch, nruns), 0, npatch)
        offs = jnp.arange(clus)
        cand = (starts[:, :, None] + offs[None, None, :]).reshape(nbatch, -1)
        cand = jnp.clip(cand, 0, npatch - 1)
        patch = jnp.zeros((nbatch, npatch), bool).at[
            jnp.arange(nbatch)[:, None], cand
        ].set(True)
        # trim/pad to exactly nmasked by keeping lowest-index masked patches
        csum = jnp.cumsum(patch, axis=1)
        patch = patch & (csum <= nmasked)
        # if short, fill from unmasked positions deterministically
        deficit = nmasked - patch.sum(axis=1, keepdims=True)
        fill = (~patch) & (jnp.cumsum(~patch, axis=1) <= deficit)
        patch = patch | fill
        idx = jnp.argsort(~patch, axis=1, stable=True)[:, :nmasked].astype(jnp.int32)
        idx = jnp.sort(idx, axis=1)
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
