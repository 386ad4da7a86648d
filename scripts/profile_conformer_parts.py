"""Conformer sub-block fwd+bwd timings at the model's hot shapes.

Where do the spat stack's ~26 ms (74 TF/s) go — MHSA, ConvModule (GLU +
depthwise k=31 + BN), or the FFs? Decides whether a depthwise-conv or
elementwise fusion effort is worth it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.models.conformer import (FeedForwardModule, ConvModule,
                                         RelPosSelfAttention)

B, L = 128, 256
ITERS = 10
DT = jnp.bfloat16


def grad_step(mod, x, **kw):
    v = mod.init({"params": jax.random.key(0)}, x, **kw)

    def loss(p, xx):
        col = dict(v); col = {**v, "params": p}
        out = mod.apply(col, xx, rngs={"dropout": jax.random.key(1)},
                        mutable=["batch_stats"], **kw)
        y = out[0] if isinstance(out, tuple) else out
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    return g, v["params"]


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:7.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for d, tag in ((512, "spec"), (256, "spat")):
        x = jnp.asarray(rng.standard_normal((B, L, d)) * 0.1, DT)
        ff = FeedForwardModule(d, 4, 0.1, DT)
        g, p = grad_step(ff, x, deterministic=False)
        timed(f"{tag} d={d} FF x4 (fwd+bwd)", g, p, x)
        cv = ConvModule(d, 31, 0.1, DT)
        g, p = grad_step(cv, x, train=True)
        timed(f"{tag} d={d} ConvModule (fwd+bwd)", g, p, x)
        at = RelPosSelfAttention(d, 4, 0.1, fused=True, dtype=DT)
        g, p = grad_step(at, x, deterministic=False)
        timed(f"{tag} d={d} MHSA fused (fwd+bwd)", g, p, x)


if __name__ == "__main__":
    main()
