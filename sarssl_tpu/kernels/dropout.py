"""Pallas TPU dropout: hardware-PRNG masks, regenerated in the backward pass.

Why: the training step spends ~20% of its time in threefry bit generation for
dropout masks over the large feed-forward/attention activations (measured
~41 ms of a 207 ms step at batch 128). The TPU has a per-core hardware PRNG
(`pltpu.prng_random_bits`) that is effectively free, and regenerating the
mask from the same seed in the VJP means no mask tensor is ever stored —
saving both the RNG time and the mask's HBM traffic.

Semantics: inverted dropout, keep-prob scaling in the forward pass only,
exactly like ``flax.linen.Dropout``; the mask distribution differs from
threefry (different PRNG), which is statistically irrelevant for dropout.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 1024


def _mask_kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 1000003)
    bits = pltpu.prng_random_bits(x_ref.shape)  # int32-ish random bits
    # rate in [0,1): keep where uniform >= rate. Compare in uint32 space.
    thresh = np.uint32(min(max(rate, 0.0), 0.9999999) * 4294967296.0)
    keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    o_ref[:] = jnp.where(keep, x_ref[:] * scale, jnp.zeros_like(x_ref[:]))


def _apply(x2d: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    rows = x2d.shape[0]
    grid = pl.cdiv(rows, _BLOCK_ROWS)
    return pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout(x2d, seed, rate):
    return _apply(x2d, seed, rate)


def _dropout_fwd(x2d, seed, rate):
    return _apply(x2d, seed, rate), seed


def _dropout_bwd(rate, seed, g2d):
    # identical mask regenerated from the saved seed
    return _apply(g2d, seed, rate), None


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


def tpu_dropout(x: jax.Array, key: jax.Array, rate: float,
                deterministic: bool = False) -> jax.Array:
    """Dropout via the TPU hardware PRNG (Pallas); flax-compatible semantics.

    Falls back to ``jax.random.bernoulli`` off-TPU (and under jit tracing on
    non-TPU backends, where Mosaic is unavailable).
    """
    if deterministic or rate == 0.0:
        return x
    if jax.default_backend() != "tpu":
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))

    seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    n = int(np.prod(x.shape))
    pad = (-n) % _LANES
    flat = x.reshape(-1)
    if pad:
        flat = jnp.pad(flat, (0, pad))
    x2d = flat.reshape(-1, _LANES)
    out = _dropout(x2d, seed, float(rate)).reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Fusable counter-hash dropout: pure XLA integer ops, no kernel boundary
# ---------------------------------------------------------------------------

def _hash_mask(key, shape, rate: float):
    """Bernoulli keep-mask from a counter-based integer hash.

    A murmur3-finalizer hash of (element index, key) in plain XLA ops: ~7
    integer instructions per element that fuse straight into the
    surrounding elementwise chain — unlike a pallas_call (opaque kernel
    boundary, one extra HBM read+write per site) or threefry (expensive).
    Statistical quality of the finalizer is ample for dropout masks.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).ravel()
    seed = kd[0] ^ (kd[-1] * jnp.uint32(0x9E3779B9))
    n = int(np.prod(shape))
    x = jax.lax.iota(jnp.uint32, n) + seed
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = np.uint32(min(max(rate, 0.0), 0.9999999) * 4294967296.0)
    return (x >= thresh).reshape(shape)


def fused_dropout(x: jax.Array, key, rate: float,
                  deterministic: bool = False) -> jax.Array:
    """Inverted dropout whose mask computation fuses into XLA's elementwise
    pipelines (measured: the Pallas kernel path costs ~19 ms/step at batch
    128 from fusion breaks alone; this path is ~free)."""
    if deterministic or rate == 0.0:
        return x
    keep = _hash_mask(key, x.shape, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))
