"""Grouped-conv merge of the spec+spat front-ends vs two separate convs.

VERDICT r4 #6's proposed experiment, measured. The flagship step runs TWO
independent 64-channel CNN front-ends (spec + spat encoders, different
weights, different inputs — models/sarssl.py pretext 'separate' path).
Each 3x3 conv tiles the MXU at K=64 contraction rows x N=64 lanes — a
quarter of the 128x128 array. Merging the pair as ONE conv on a
channel-concatenated input with ``feature_group_count=2`` keeps the exact
same FLOPs and semantics; the question is purely whether XLA's grouped
emitter packs the two independent K=64/N=64 problems onto the MXU better
than two sequential conv calls it is free to overlap anyway.

Same hot shape as profile_conv_s2d.py (B,H,W,C = 128,256,256,64) so the
numbers line up with the r2 table in scripts/README.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, C = 128, 256, 256, 64
ITERS = 10
DT = jnp.bfloat16
# useful FLOPs of the PAIR of convs (fwd)
F = 2 * (2 * B * H * W * C * C * 9)


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def pair_separate(xa, xb, wa, wb):
    return conv(xa, wa), conv(xb, wb)


def pair_grouped(xa, xb, wa, wb):
    x = jnp.concatenate([xa, xb], axis=-1)            # (B,H,W,2C)
    w = jnp.concatenate([wa, wb], axis=-1)            # (3,3,C,2C), groups=2
    y = conv(x, w, groups=2)
    return y[..., :C], y[..., C:]


def timed(name, fn, *args, flops=F):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s "
          f"(useful pair fwd {F/1e9:.0f} GF)", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)
    xb = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)
    wa = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)
    wb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)

    ya, yb = timed("separate fwd", jax.jit(pair_separate), xa, xb, wa, wb)
    ga, gb = timed("grouped  fwd", jax.jit(pair_grouped), xa, xb, wa, wb)
    err = max(
        float(jnp.abs(ga.astype(jnp.float32) - ya.astype(jnp.float32)).max()),
        float(jnp.abs(gb.astype(jnp.float32) - yb.astype(jnp.float32)).max()))
    print("fwd maxdiff:", err, flush=True)

    def loss(f):
        def g(xa, xb, wa, wb):
            ya, yb = f(xa, xb, wa, wb)
            return (jnp.sum(ya.astype(jnp.float32) ** 2)
                    + jnp.sum(yb.astype(jnp.float32) ** 2)) * 1e-6
        return g

    timed("separate fwd+bwd",
          jax.jit(jax.grad(loss(pair_separate), argnums=(0, 1, 2, 3))),
          xa, xb, wa, wb, flops=3 * F)
    timed("grouped  fwd+bwd",
          jax.jit(jax.grad(loss(pair_grouped), argnums=(0, 1, 2, 3))),
          xa, xb, wa, wb, flops=3 * F)


if __name__ == "__main__":
    main()
