"""Round-3 TPU timings: fft vs complex-free matmul STFT in the full step,
interleaved twice to control for drift."""
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
    cfg = SARSSLConfig(dtype="bfloat16")
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                        cfg.effective_nmasked())
    state0 = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((BATCH, NSAMPLE, 2), np.float32) * 0.05)
    key = jax.random.key(2)

    steps = {}
    states = {}
    for name, impl in [("fft", "fft"), ("matmul", "matmul")]:
        fc = FeatureConfig(stft_impl=impl)
        steps[name] = jax.jit(pretrain_step_body(model, fc))
        states[name] = state0
        s, m = steps[name](states[name], wave, 1e-3, key)
        states[name] = s
        print(f"{name}: compiled, loss={float(m['loss']):.4f}", flush=True)

    for round_ in range(2):
        for name in ("fft", "matmul"):
            s = states[name]
            t0 = time.perf_counter()
            for i in range(ITERS):
                s, m = steps[name](s, wave, 1e-3, jax.random.fold_in(key, i))
            float(m["loss"])
            dt = (time.perf_counter() - t0) / ITERS
            states[name] = s
            print(f"round{round_} {name:8s} {dt*1e3:8.1f} ms/step "
                  f"{BATCH/dt:8.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
