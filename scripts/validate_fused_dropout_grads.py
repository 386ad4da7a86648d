"""Rigorous gradient validation for in-kernel attention dropout.

Recover the kernel's dropout mask by calling the kernel with v = I (then
out = P_dropped), build a jnp implementation using THAT mask, and compare
all four gradients. This sidesteps finite-difference noise entirely.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.kernels.attention import fused_attention

B, H, L, D = 2, 2, 256, 64
SCALE = 0.125
RATE = 0.3


def main():
    ks = jax.random.split(jax.random.key(0), 4)
    qu = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    bias = jax.random.normal(ks[3], (B, H, L, L), jnp.float32)
    seed = jnp.asarray([4242], jnp.int32)

    # recover P_dropped with basis-block v (same seed -> same mask per call)
    eye = np.eye(L, dtype=np.float32)
    chunks = []
    for c in range(L // D):
        vb = jnp.broadcast_to(jnp.asarray(eye[:, c * D:(c + 1) * D]),
                              (B, H, L, D))
        chunks.append(np.asarray(fused_attention(qu, k, vb, bias, seed,
                                                 SCALE, RATE)))
    p_drop = np.concatenate(chunks, axis=-1)  # (B, H, L, L)
    mask = (p_drop != 0.0).astype(np.float32)
    print("mask keep fraction:", mask.mean(), "(want ~0.7)", flush=True)
    maskj = jnp.asarray(mask)

    def ref_with_mask(args):
        qu_, k_, v_, bias_ = args
        s = (jnp.einsum("bhid,bhjd->bhij", qu_, k_) + bias_) * SCALE
        p = jax.nn.softmax(s, axis=-1)
        pd = p * maskj / (1.0 - RATE)
        out = jnp.einsum("bhij,bhjd->bhid", pd, v_)
        return jnp.sum(out ** 2)

    def fused_loss(args):
        return jnp.sum(fused_attention(*args, seed, SCALE, RATE) ** 2)

    gr = jax.grad(ref_with_mask)((qu, k, v, bias))
    gf = jax.grad(fused_loss)((qu, k, v, bias))
    for a, b, name in zip(gf, gr, ["dqu", "dk", "dv", "dbias"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-9
        print(f"{name}: max rel err {np.abs(a - b).max() / denom:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
