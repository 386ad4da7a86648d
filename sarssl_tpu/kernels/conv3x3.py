"""Pallas 3x3 SAME convolution for the CNN front-end hot spot.

Why: the front-end's 64->64 3x3 convs are ~65% of the train step. XLA
lowers them to per-tap matmuls with K=64 — half the MXU's 128 contraction
rows, on top of the N=64 half-lane output — observed ~43 TFLOP/s on v5e.
This kernel builds the im2col patch tile *in VMEM* (9 shifted slices
concatenated along the channel axis) and contracts once with the
(9C, Cout) flattened weights: the contraction dimension 9C = 576 >> 128
keeps the systolic array's rows fully fed; only the N=64 ceiling remains.

Halo handling without overlapping blocks (which BlockSpecs can't express)
and without manual HBM slicing (whose tiling alignment rejects 64-channel
arrays): the row above and below each H-tile are gathered into a tiny
side array in XLA, and each grid step receives its (2, W, C) halo rows as
a second, normally-blocked input. Width is zero-padded to a sublane
multiple once in XLA.

Backward: dx reuses this kernel with rotated/io-swapped weights; dW is the
filter backprop (contraction over batch*H*W), which XLA already runs as
one big matmul, so it stays in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(mid_ref, halo_ref, w_ref, out_ref, *, TH: int, W: int, C: int):
    x = jnp.concatenate([halo_ref[0, 0, 0:1], mid_ref[0],
                         halo_ref[0, 0, 1:2]], axis=0)  # (TH+2, wpad, C)
    taps = []
    for dh in range(3):
        for dw in range(3):
            taps.append(x[dh:dh + TH, dw:dw + W, :].reshape(TH * W, C))
    # pair taps to 2C = 128 contraction rows per dot: the systolic array's
    # K dimension is fully loaded (Mosaic cannot lane-concat all 9 at once)
    acc = jnp.zeros((TH * W, w_ref.shape[-1]), jnp.float32)
    for i in range(0, 8, 2):
        pair = jnp.concatenate([taps[i], taps[i + 1]], axis=1)
        acc += jnp.dot(pair, w_ref[i * C:(i + 2) * C],
                       preferred_element_type=jnp.float32)
    acc += jnp.dot(taps[8], w_ref[8 * C:9 * C],
                   preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(TH, W, -1).astype(out_ref.dtype)


def _pallas_conv3x3(x: jax.Array, w: jax.Array, tile_h: int = 16,
                    interpret: bool = False) -> jax.Array:
    """x (NB, H, W, C) NHWC, w (3, 3, C, Cout) HWIO -> (NB, H, W, Cout)."""
    NB, H, W, C = x.shape
    Cout = w.shape[-1]
    TH = min(tile_h, H)
    assert H % TH == 0, (H, TH)
    ntile = H // TH
    wpad = -(-(W + 2) // 8) * 8
    # width-padded once; rows stay unpadded (halos carry the boundary zeros)
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, wpad - W - 1), (0, 0)))
    zrow = jnp.zeros((NB, 1, wpad, C), x.dtype)
    tops = jnp.concatenate([zrow, xw[:, TH - 1::TH][:, :ntile - 1]], axis=1)
    bots = jnp.concatenate([xw[:, TH::TH][:, :ntile - 1], zrow], axis=1)
    halo = jnp.stack([tops, bots], axis=2)  # (NB, ntile, 2, wpad, C)
    w_flat = w.reshape(9 * C, Cout).astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, W=W, C=C),
        out_shape=jax.ShapeDtypeStruct((NB, H, W, Cout), x.dtype),
        grid=(NB, ntile),
        in_specs=[
            pl.BlockSpec((1, TH, wpad, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, wpad, C), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, halo, w_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3(x: jax.Array, w: jax.Array, tile_h: int = 16,
            interpret: bool = False) -> jax.Array:
    """SAME 3x3 convolution, NHWC x HWIO, Pallas-fused im2col matmul."""
    return _pallas_conv3x3(x, w, tile_h, interpret)


def _fwd(x, w, tile_h, interpret):
    return _pallas_conv3x3(x, w, tile_h, interpret), (x, w)


def _bwd(tile_h, interpret, res, dy):
    x, w = res
    # dx = conv(dy, rot180(w) with in/out channels swapped)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _pallas_conv3x3(dy, w_rot.astype(dy.dtype), tile_h, interpret)
    # dW: filter backprop — one big-K contraction XLA handles well
    _, w_vjp = jax.vjp(
        lambda ww: jax.lax.conv_general_dilated(
            x, ww.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w)
    (dw,) = w_vjp(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3.defvjp(_fwd, _bwd)


def reference_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
