"""Step-time breakdown on the real TPU: which component costs what.

Times several jitted variants of the pretrain step. Host-fetches a scalar
after each timed loop because block_until_ready does not synchronize on the
axon tunnel backend.

Run: python scripts/profile_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask, stft_features
from sarssl_tpu.train import create_train_state
from sarssl_tpu.train.steps import pretrain_step_body

BATCH = 128
NSAMPLE = 65792
ITERS = 5


def timed(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:8.1f} ms/step   {BATCH/dt:8.1f} utt/s", flush=True)
    return dt


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[0]


def main():
    feat_cfg = FeatureConfig()
    cfg = SARSSLConfig(dtype="bfloat16")
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((BATCH, NSAMPLE, 2), np.float32) * 0.05)
    key = jax.random.key(2)
    print("compiling variants...", flush=True)

    # 1. features only
    feats_fn = jax.jit(lambda w: stft_features(w, feat_cfg))
    timed("stft_features", feats_fn, wave)
    feats = feats_fn(wave)

    # 2. forward only (eval, no dropout)
    def fwd(params, bs, x, k):
        mask = gen_patch_mask(k, BATCH, cfg.npatch, cfg.effective_nmasked())
        loss, diff, _ = model.apply({"params": params, "batch_stats": bs},
                                    x, mask, False)
        return loss
    fwd_j = jax.jit(fwd)
    timed("forward (no dropout)", fwd_j, state.params, state.batch_stats,
          feats, key)

    # 3. forward+backward, no dropout (train=False gradient)
    grad_j = jax.jit(jax.grad(fwd))
    timed("fwd+bwd (no dropout)", grad_j, state.params, state.batch_stats,
          feats, key)

    # 4. full train step (threefry dropout)
    step = jax.jit(pretrain_step_body(model, feat_cfg))
    def full(state, w, k):
        return step(state, w, 1e-3, k)
    s = state
    full_j = full
    out = full_j(s, wave, key)
    _sync(out[1])
    t0 = time.perf_counter()
    for i in range(ITERS):
        s, m = full_j(s, wave, jax.random.fold_in(key, i))
    _sync(m)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{'full train step (threefry)':32s} {dt*1e3:8.1f} ms/step   {BATCH/dt:8.1f} utt/s", flush=True)

    # 5. full train step with rbg dropout keys (cheap TPU PRNG)
    rbg_key = jax.random.key(3, impl="rbg")
    s2 = state
    out = full_j(s2, wave, rbg_key)
    _sync(out[1])
    t0 = time.perf_counter()
    for i in range(ITERS):
        s2, m2 = full_j(s2, wave, jax.random.fold_in(rbg_key, i))
    _sync(m2)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{'full train step (rbg prng)':32s} {dt*1e3:8.1f} ms/step   {BATCH/dt:8.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
