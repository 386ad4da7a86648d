"""Pallas conv3x3 vs XLA conv at the model's hot shape (fwd and fwd+bwd)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.kernels.conv3x3 import conv3x3, reference_conv3x3

B, H, W, C = 128, 256, 256, 64
ITERS = 10
DT = jnp.bfloat16
F = 2 * B * H * W * C * C * 9


def timed(name, fn, *args, flops=F):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)

    for th in (8, 16, 32):
        y = timed(f"pallas fwd TH={th}",
                  jax.jit(lambda x, w, th=th: conv3x3(x, w, th)), x, w)
    yr = timed("xla fwd", jax.jit(reference_conv3x3), x, w)
    err = float(jnp.abs(y.astype(jnp.float32) - yr.astype(jnp.float32)).max())
    print("fwd maxdiff:", err, flush=True)

    def lp(x, w):
        return jnp.sum(conv3x3(x, w, 32).astype(jnp.float32) ** 2) * 1e-6

    def lr(x, w):
        return jnp.sum(reference_conv3x3(x, w).astype(jnp.float32) ** 2) * 1e-6

    timed("pallas fwd+bwd TH=32", jax.jit(jax.grad(lp, argnums=(0, 1))),
          x, w, flops=3 * F)
    timed("xla fwd+bwd", jax.jit(jax.grad(lr, argnums=(0, 1))),
          x, w, flops=3 * F)


if __name__ == "__main__":
    main()
