"""TPU validation + timing of the Pallas dropout kernel, then the full step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.kernels import tpu_dropout

BATCH = 128
NSAMPLE = 65792
ITERS = 5


def main():
    # 1. kernel-level validation on hardware
    x = jnp.ones((4096, 2048), jnp.bfloat16)
    key = jax.random.key(0)
    f = jax.jit(lambda x: tpu_dropout(x, key, 0.3))
    out = np.asarray(f(x)).astype(np.float32)
    zf = (out == 0).mean()
    print(f"pallas dropout zero-frac {zf:.4f} (want 0.30), "
          f"mean {out.mean():.4f} (want 1.0)", flush=True)
    g = jax.jit(jax.grad(lambda x: jnp.sum(
        tpu_dropout(x, key, 0.3).astype(jnp.float32))))(x)
    g = np.asarray(g).astype(np.float32)
    match = ((g != 0) == (out != 0)).mean()
    print(f"bwd mask identity match: {match:.4f} (want 1.0)", flush=True)

    # 2. full train step with pallas dropout
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
    from sarssl_tpu.train import create_train_state
    from sarssl_tpu.train.steps import pretrain_step_body

    cfg = SARSSLConfig(dtype="bfloat16")
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
    s, m = step(state, wave, 1e-3, key)
    print("full step compiled, loss:", float(m["loss"]), flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        s, m = step(s, wave, 1e-3, jax.random.fold_in(key, i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"full step w/ pallas dropout: {dt*1e3:.1f} ms/step "
          f"{BATCH/dt:.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
