"""Round-4: batch-size scaling of the full train step (pallas dropout)."""
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
ITERS = 5


def main():
    cfg = SARSSLConfig(dtype="bfloat16")
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    fc = FeatureConfig()
    key = jax.random.key(2)
    for batch in (256, 512):
        try:
            x0 = jnp.zeros((batch, nmic, nf, nt, nreim), jnp.float32)
            m0 = gen_patch_mask(jax.random.key(0), batch, cfg.npatch,
                                cfg.effective_nmasked())
            state = create_train_state(model, jax.random.key(1), x0, m0)
            wave = jnp.asarray(
                np.random.default_rng(0)
                .standard_normal((batch, NSAMPLE, 2), np.float32) * 0.05)
            step = jax.jit(pretrain_step_body(model, fc), donate_argnums=(0,))
            s, m = step(state, wave, 1e-3, key)
            print(f"bs{batch}: compiled, loss {float(m['loss']):.4f}",
                  flush=True)
            t0 = time.perf_counter()
            for i in range(ITERS):
                s, m = step(s, wave, 1e-3, jax.random.fold_in(key, i))
            float(m["loss"])
            dt = (time.perf_counter() - t0) / ITERS
            print(f"bs{batch}: {dt*1e3:.1f} ms/step {batch/dt:.1f} utt/s",
                  flush=True)
            del s, state, wave
        except Exception as e:
            print(f"bs{batch}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
