"""Round-7 TPU: fused attention WITH in-kernel attention dropout.

Validates the hardware dropout path (statistics, determinism, finite-diff
gradient) and times the full train step with fused_attention=True at the
reference training config (dropout 0.1 everywhere).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.kernels.attention import fused_attention, reference_attention

BATCH = 128
NSAMPLE = 65792
ITERS = 5


def validate():
    B, H, L, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.key(0), 4)
    qu = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    bias = jax.random.normal(ks[3], (B, H, L, L), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)

    out0 = np.asarray(fused_attention(qu, k, v, bias, seed, 0.125, 0.0))
    ref = np.asarray(reference_attention(qu, k, v, bias, 0.125))
    print("rate=0 max err vs reference:", np.abs(out0 - ref).max(), flush=True)

    out = np.asarray(fused_attention(qu, k, v, bias, seed, 0.125, 0.5))
    out2 = np.asarray(fused_attention(qu, k, v, bias, seed, 0.125, 0.5))
    print("rate=0.5: deterministic:", np.array_equal(out, out2),
          " |mean| ratio:", np.abs(out).mean() / np.abs(ref).mean(), flush=True)

    def f(qu_):
        return jnp.sum(fused_attention(qu_, k, v, bias, seed, 0.125, 0.3) ** 2)

    g = np.asarray(jax.grad(f)(qu))
    eps = 1e-2
    errs = []
    for idx in [(0, 0, 0, 0), (1, 1, 5, 3), (0, 1, 20, 10)]:
        e = np.zeros_like(np.asarray(qu)); e[idx] = eps
        fd = (float(f(qu + e)) - float(f(qu - e))) / (2 * eps)
        errs.append(abs(g[idx] - fd) / (abs(fd) + 1e-6))
    print("grad finite-diff rel errs:", [f"{x:.4f}" for x in errs], flush=True)


def time_full_step():
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
    from sarssl_tpu.train import create_train_state
    from sarssl_tpu.train.steps import pretrain_step_body

    cfg = SARSSLConfig(dtype="bfloat16", fused_attention=True)  # dropout 0.1
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((BATCH, NSAMPLE, 2), np.float32) * 0.05)
    step = jax.jit(pretrain_step_body(model, FeatureConfig()),
                   donate_argnums=(0,))
    key = jax.random.key(2)
    s, m = step(state, wave, 1e-3, key)
    print("full fused step (dropout 0.1) loss:", float(m["loss"]), flush=True)
    t0 = time.perf_counter()
    losses = []
    for i in range(ITERS):
        s, m = step(s, wave, 1e-3, jax.random.fold_in(key, i))
    losses.append(float(m["loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"full fused step: {dt*1e3:.1f} ms/step {BATCH/dt:.1f} utt/s "
          f"(loss {losses[-1]:.4f})", flush=True)


if __name__ == "__main__":
    validate()
    time_full_step()
