"""Space-to-depth 3x3 conv vs plain XLA conv at the front-end's hot shape.

The front-end's 3x3 convs have C=64 in/out channels: XLA lowers them to
per-tap matmuls with K=64 contraction rows and N=64 output lanes — a
quarter of the 128x128 MXU. Space-to-depth by 2 along W is a *free* NHWC
reshape (B,H,W,64)->(B,H,W/2,128); the same convolution is then expressed
with an expanded (3,3,128,128) kernel that is 50% structurally zero:
2x the FLOPs at up to 4x the MXU occupancy.
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
F = 2 * B * H * W * C * C * 9


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def expand_w_s2d2(w):
    """(3,3,C,C) HWIO -> (3,3,2C,2C) operating on W-s2d-by-2 inputs."""
    c = w.shape[2]
    w2 = jnp.zeros((3, 3, 2 * c, 2 * c), w.dtype)
    # out parity q, tap dw -> (position delta D, in parity r)
    for q in range(2):
        for dw in range(3):
            s = q + dw - 1
            dpos, r = s // 2, s % 2
            w2 = w2.at[:, dpos + 1, r * c:(r + 1) * c,
                       q * c:(q + 1) * c].set(w[:, dw])
    return w2


def conv_s2d(x, w):
    b, h, wdt, c = x.shape
    x2 = x.reshape(b, h, wdt // 2, 2 * c)
    w2 = expand_w_s2d2(w).astype(x.dtype)
    y2 = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y2.reshape(b, h, wdt, c)


def timed(name, fn, *args, flops=F):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s "
          f"(of the useful {F/1e9:.0f} GF)", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)

    yr = timed("xla fwd", jax.jit(conv_ref), x, w)
    ys = timed("s2d fwd", jax.jit(conv_s2d), x, w)
    err = float(jnp.abs(ys.astype(jnp.float32) - yr.astype(jnp.float32)).max())
    print("fwd maxdiff:", err, flush=True)

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w).astype(jnp.float32) ** 2) * 1e-6

    timed("xla fwd+bwd", jax.jit(jax.grad(loss(conv_ref), argnums=(0, 1))),
          x, w, flops=3 * F)
    timed("s2d fwd+bwd", jax.jit(jax.grad(loss(conv_s2d), argnums=(0, 1))),
          x, w, flops=3 * F)


if __name__ == "__main__":
    main()
