"""Round-10: full-step A/B — batch size and feature dtype variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
from sarssl_tpu.train import create_train_state
from sarssl_tpu.train.steps import pretrain_step_body

NSAMPLE = 65792
ITERS = 8


def bench(tag, batch, fdtype):
    cfg = SARSSLConfig(dtype="bfloat16", fused_attention=True)
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((batch, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), batch, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((batch, NSAMPLE, 2), np.float32) * .05)
    fc = FeatureConfig(dtype=fdtype)
    step = jax.jit(pretrain_step_body(model, fc), donate_argnums=(0,))
    s, m = step(state, wave, 1e-3, jax.random.key(2))
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        s, m = step(s, wave, 1e-3, jax.random.fold_in(jax.random.key(2), i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag:28s} {dt*1e3:7.1f} ms  {batch/dt:8.1f} utt/s  "
          f"loss0={loss0:.5f}", flush=True)
    del s, state


if __name__ == "__main__":
    bench("bs128 f32-feats (base)", 128, jnp.float32)
    bench("bs128 bf16-feats", 128, jnp.bfloat16)
    bench("bs192 f32-feats", 192, jnp.float32)
    bench("bs256 f32-feats", 256, jnp.float32)
