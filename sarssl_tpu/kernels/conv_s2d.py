"""Pallas space-to-depth 3x3 convolution for the 64-channel CNN front-end.

The front-end's 3x3 convs (reference model.py:50-64 uses conv_chs=64) are
~60% of the train step, and C=64 half-fills BOTH MXU dimensions: XLA lowers
them to 9 per-tap matmuls with K=64 contraction rows and N=64 output lanes
— a 25% occupancy ceiling (~49 TFLOP/s on v5e, ~40-42 observed).

Space-to-depth by 2 along W fixes both at once, and in NHWC it is *free*:
``(B, H, W, 64) -> (B, H, W/2, 128)`` is a row-major reshape — the Pallas
input block reads straight out of ``x``'s buffer and the output is written
in its final layout, so the kernel adds **zero** extra HBM copies (an
earlier padded-layout variant spent 28 ms/1 GB-canvas on XLA pad + slice
copies alone, more than the whole XLA conv). The same convolution is then
expressed over the s2d layout with an expanded ``(3, 3, 128, 128)`` kernel
(structurally half zero), i.e. 2x the raw FLOPs — but as full-width MXU
dots instead of quarter-occupancy ones.

Kernel mechanics (why this layout has no Mosaic relayouts):
  * the s2d tile ``(TH+2, WH, 128)`` (one halo row above/below) is viewed
    as a 2-D ``((TH+2)*WH, 128)`` buffer — lanes are the 128 s2d channels;
  * the three H-taps are row offsets of ``dh*WH`` — WH = W/2 stays a
    multiple of 8, so they are sublane-aligned static slices, free — and
    lane-concatenate at 128-lane boundaries (also free) into one
    ``(TH*WH, 384)`` operand contracted with the merged ``(384, 384)``
    weight matrix in a single MXU dot;
  * the W-taps (s2d position +-1) are applied to the f32 *result* columns
    as whole-buffer sublane rotates (Mosaic only rotates 32-bit data):
    ``roll(dot(x_aligned, w), +-1)[r] == dot(x_shifted, w)[r]``;
  * rows whose rotate wrapped across an H-row boundary (position 0 for the
    left tap, position WH-1 for the right tap) are exactly the SAME-padding
    zeros of the original conv, applied as an iota mask.

Halo rows between H-tiles travel in a small side array gathered in XLA
(BlockSpecs cannot express overlapping blocks).

Backward: dx is the same kernel with the 180-degree-rotated, io-swapped
weights (stride-1 SAME conv identity); dW stays in XLA, whose filter
backprop (one huge-K matmul) already runs near the MXU roofline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def expand_weights_s2d2(w: jax.Array) -> jax.Array:
    """(3, 3, C, C) HWIO -> (3, 3, 2C, 2C) acting on W-s2d-by-2 tensors.

    Output parity q and original tap dw map to (position delta, in parity):
    s = q + dw - 1, delta = s // 2, r = s % 2. Differentiable (pure
    scatter of slices), so grads flow back to the original weights.
    """
    c = w.shape[2]
    w2 = jnp.zeros((3, 3, 2 * c, 2 * c), w.dtype)
    for q in range(2):
        for dw in range(3):
            s = q + dw - 1
            dpos, r = s // 2, s % 2
            w2 = w2.at[:, dpos + 1, r * c:(r + 1) * c,
                       q * c:(q + 1) * c].set(w[:, dw])
    return w2


def _kernel(mid_ref, halo_ref, w_ref, out_ref, *, TH: int, WH: int):
    c2 = mid_ref.shape[-1]
    # (TH+2, WH, C2) tile: halo row above, TH mid rows, halo row below
    x = jnp.concatenate([halo_ref[0, 0, 0:1], mid_ref[0],
                         halo_ref[0, 0, 1:2]], axis=0)
    x2d = x.reshape((TH + 2) * WH, c2)
    n = TH * WH
    xcat = jnp.concatenate([x2d[dh * WH:dh * WH + n] for dh in range(3)],
                           axis=1)                       # (n, 3*C2)
    res = jnp.dot(xcat, w_ref[0], preferred_element_type=jnp.float32)
    # s2d-position taps: rotate the f32 result by +-1 row. Rows that
    # wrapped across an H-row boundary correspond to the conv's SAME
    # padding -> zero them with a position mask.
    p = jax.lax.broadcasted_iota(jnp.int32, (n, c2), 0) % WH
    left = jnp.where(p == 0, 0.0, pltpu.roll(res[:, :c2], 1, 0))
    right = jnp.where(p == WH - 1, 0.0, pltpu.roll(res[:, 2 * c2:], n - 1, 0))
    acc = left + res[:, c2:2 * c2] + right
    out_ref[0] = acc.reshape(TH, WH, c2).astype(out_ref.dtype)


def _conv_s2d(x: jax.Array, w2: jax.Array, tile_h: int = 32,
              interpret: bool = False) -> jax.Array:
    """x (B, H, W, C) NHWC; w2 expanded (3, 3, 2C, 2C). Returns same shape.

    Requires W/2 to be a multiple of 8 (sublane alignment of the free s2d
    view); callers fall back to XLA otherwise.
    """
    B, H, W, C = x.shape
    c2 = 2 * C
    WH = W // 2
    assert W % 2 == 0 and WH % 8 == 0, (W,)
    TH = min(tile_h, H)
    assert H % TH == 0, (H, TH)
    ntile = H // TH
    xs = x.reshape(B, H, WH, c2)  # free view
    zrow = jnp.zeros((B, 1, WH, c2), x.dtype)
    tops = jnp.concatenate([zrow, xs[:, TH - 1::TH][:, :ntile - 1]], axis=1)
    bots = jnp.concatenate([xs[:, TH::TH][:, :ntile - 1], zrow], axis=1)
    halo = jnp.stack([tops, bots], axis=2)  # (B, ntile, 2, WH, c2)
    # (3, 3, c2, c2) -> one (3*c2, 3*c2) matrix: row block dh, column
    # block j hold w2[dh, j]; matches the kernel's lane-concat tap order.
    wcat = jnp.transpose(w2, (0, 2, 1, 3)).reshape(3 * c2, 3 * c2)
    out = pl.pallas_call(
        functools.partial(_kernel, TH=TH, WH=WH),
        out_shape=jax.ShapeDtypeStruct((B, H, WH, c2), x.dtype),
        grid=(B, ntile),
        in_specs=[
            pl.BlockSpec((1, TH, WH, c2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, WH, c2), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c2, 3 * c2), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, WH, c2), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, halo, wcat[None].astype(x.dtype))
    return out.reshape(B, H, W, C)  # free view


def supports_s2d(x_shape, tile_h: int = 32) -> bool:
    """Shape gate for the free-view fast path (matches _conv_s2d's
    asserts: aligned s2d width AND an exact H tiling)."""
    B, H, W, C = x_shape
    th = min(tile_h, H)
    return W % 2 == 0 and (W // 2) % 8 == 0 and H % th == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_s2d(x: jax.Array, w: jax.Array, tile_h: int = 32,
                interpret: bool = False) -> jax.Array:
    """SAME 3x3 conv, NHWC x HWIO (C==Cout), via the s2d Pallas kernel."""
    return _conv_s2d(x, expand_weights_s2d2(w), tile_h, interpret)


def _fwd(x, w, tile_h, interpret):
    return conv3x3_s2d(x, w, tile_h, interpret), (x, w)


def _bwd(tile_h, interpret, res, dy):
    x, w = res
    # dx = conv(dy, rot180(w) io-swapped), stride-1 SAME identity
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv_s2d(dy, expand_weights_s2d2(w_rot).astype(dy.dtype),
                   tile_h, interpret)
    # dW: XLA's filter backprop is one huge-K matmul — already fast
    _, w_vjp = jax.vjp(
        lambda ww: jax.lax.conv_general_dilated(
            x, ww.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w)
    (dw,) = w_vjp(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3_s2d.defvjp(_fwd, _bwd)
