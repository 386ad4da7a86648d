"""Microbench: 3x3 conv variants for the CNN front-end hot spot.

The per-encoder convs are 64->64 on (128, 256, 256) maps — 64 output
channels is half the MXU lane width. Candidates:
  a. baseline 64->64 (what the model runs, x2 encoders sequentially)
  b. 64->128 (lane-filling, 2x FLOPs — utilization reference)
  c. grouped 128->128 g=2 (both encoders in ONE conv, full lanes)
  d. batch-stacked 64->64 on 2x batch (shared-weight shape reference)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 128, 256, 256
ITERS = 10
DT = jnp.bfloat16


def timed(name, fn, *args, flops=0):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # scalar sync, not a full fetch
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # scalar sync, not a full fetch
    dt = (time.perf_counter() - t0) / ITERS
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:44s} {dt*1e3:7.2f} ms   {tf:6.1f} TFLOP/s", flush=True)
    return dt


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT)


def main():
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((B, H, W, 64)), DT)
    x128 = jnp.asarray(rng.standard_normal((B, H, W, 128)), DT)
    x64b2 = jnp.asarray(rng.standard_normal((2 * B, H, W, 64)), DT)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, DT)
    w128o = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05, DT)
    wg = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05, DT)

    f = 2 * B * H * W * 64 * 64 * 9

    j = lambda fn: jax.jit(fn)
    timed("a. 64->64 (x1)", j(lambda x: conv(x, w64)), x64, flops=f)
    timed("a2. 64->64 twice (two encoders)",
          j(lambda x: conv(x, w64) + 0 * conv(x, w64 * 2)), x64, flops=2 * f)
    timed("b. 64->128", j(lambda x: conv(x, w128o)), x64, flops=2 * f)
    timed("c. grouped 128->128 g=2",
          j(lambda x: conv(x, wg, groups=2)), x128, flops=2 * f)
    timed("d. 64->64 on 2x batch",
          j(lambda x: conv(x, w64)), x64b2, flops=2 * f)

    # fwd+bwd of the grouped merge vs two separate (the training case)
    def two_sep(ws, x):
        y1 = conv(x, ws[0])
        y2 = conv(x, ws[1])
        return jnp.sum(y1.astype(jnp.float32) ** 2) + \
            jnp.sum(y2.astype(jnp.float32) ** 2)

    def grouped(wg_, x2):
        y = conv(x2, wg_, groups=2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g2 = jax.jit(jax.grad(two_sep))
    gg = jax.jit(jax.grad(grouped))
    timed("two separate 64->64 fwd+bwd",
          g2, (w64, w64 * 2), x64, flops=6 * f)
    timed("grouped g=2 fwd+bwd", gg, wg, x128, flops=6 * f)


if __name__ == "__main__":
    main()
