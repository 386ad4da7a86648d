"""Round-8: bf16 feature tensors (conv-input bandwidth) vs f32 features."""
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

BATCH = 128
NSAMPLE = 65792
ITERS = 5


def main():
    cfg = SARSSLConfig(dtype="bfloat16", fused_attention=True)
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                        cfg.effective_nmasked())
    state0 = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((BATCH, NSAMPLE, 2), np.float32) * 0.05)
    key = jax.random.key(2)
    for name, fdtype in [("f32 features", jnp.float32),
                         ("bf16 features", jnp.bfloat16)]:
        fc = FeatureConfig(dtype=fdtype)
        step = jax.jit(pretrain_step_body(model, fc), donate_argnums=(0,))
        state = create_train_state(model, jax.random.key(1), x0, m0)
        s, m = step(state, wave, 1e-3, key)
        loss0 = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(ITERS):
            s, m = step(s, wave, 1e-3, jax.random.fold_in(key, i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:16s} {dt*1e3:8.1f} ms/step {BATCH/dt:9.1f} utt/s "
              f"loss0={loss0:.6f}", flush=True)
        del s


if __name__ == "__main__":
    main()
