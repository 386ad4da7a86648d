"""Where do the CNN front-end's 118 ms actually go? Pass-level timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from sarssl_tpu.models.encoder import CNNFrontEnd
def reference_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

B, H, W, C = 128, 256, 256, 64
ITERS = 5
DT = jnp.bfloat16
F = 2 * B * H * W * C * C * 9


def timed(name, fn, *args, flops=0):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    tf = f"{flops/dt/1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:40s} {dt*1e3:7.2f} ms  {tf}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)
    dy = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, DT)

    timed("conv fwd", jax.jit(reference_conv3x3), x, w, flops=F)
    dx_fn = jax.jit(lambda dy, w: jax.vjp(
        lambda xx: reference_conv3x3(xx, w), x)[1](dy)[0])
    timed("conv bwd dx", dx_fn, dy, w, flops=F)
    dw_fn = jax.jit(lambda dy, x: jax.vjp(
        lambda ww: reference_conv3x3(x, ww), w)[1](dy)[0])
    timed("conv bwd dW", dw_fn, dy, x, flops=F)

    # BatchNorm train-mode cost at the conv activation size
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=DT)
    v = bn.init(jax.random.key(0), x)

    def bn_loss(p, xx):
        y, _ = bn.apply({"params": p, "batch_stats": v["batch_stats"]}, xx,
                        mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    timed("BN train fwd", jax.jit(
        lambda p, xx: bn.apply({"params": p,
                                "batch_stats": v["batch_stats"]}, xx,
                               mutable=["batch_stats"])[0]), v["params"], x)
    timed("BN train fwd+bwd", jax.jit(jax.grad(bn_loss, argnums=(0, 1))),
          v["params"], x)

    # full front: BN train vs BN eval (isolates BN cost inside the front)
    for train in (True, False):
        front = CNNFrontEnd(512, (256, 1), dtype=DT)
        vv = front.init(jax.random.key(0), x, True)

        def loss(p, xx, train=train):
            out = front.apply(
                {"params": p, "batch_stats": vv["batch_stats"]}, xx, train,
                mutable=["batch_stats"] if train else [])
            y = out[0] if train else out
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        timed(f"front fwd+bwd train={train}",
              jax.jit(jax.grad(loss, argnums=(0, 1))), vv["params"], x,
              flops=3 * 2 * F)


if __name__ == "__main__":
    main()
