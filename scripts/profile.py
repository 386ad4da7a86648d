"""Parameterized TPU step profiler — supersedes profile_step{2..10}.py.

One script for the step-variant experiments those scripts ran one-off in
rounds 1-2 (their findings are recorded in scripts/README.md):

  python scripts/profile.py                        # full reference step
  python scripts/profile.py --bs 256               # batch scaling
  python scripts/profile.py --dropout 0            # dropout ablation
  python scripts/profile.py --no-fused-attention   # XLA attention
  python scripts/profile.py --dtype float32        # precision ablation
  python scripts/profile.py --remat                # conformer remat
  python scripts/profile.py --parts                # features/fwd/fwd+bwd split

Host-fetches a scalar after each timed loop: block_until_ready does NOT
synchronize on the axon tunnel backend.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--dropout", type=float, default=None,
                    help="override all dropout rates (e.g. 0)")
    ap.add_argument("--no-fused-attention", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--parts", action="store_true",
                    help="also time features-only and fwd-only")
    args = ap.parse_args()

    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask, stft_features
    from sarssl_tpu.train import create_train_state
    from sarssl_tpu.train.steps import pretrain_step_body

    feat_cfg = FeatureConfig()
    overrides = {"dtype": args.dtype,
                 "fused_attention": not args.no_fused_attention,
                 "remat_cnn": args.remat}
    if args.dropout is not None:
        overrides["dropout"] = args.dropout
    cfg = SARSSLConfig(**overrides)
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    nsample = 65792

    x0 = jnp.zeros((args.bs, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), args.bs, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.bs, nsample, 2)).astype(np.float32) * 0.05)

    def timed(name, fn, *a):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.1f} ms   {args.bs / dt:8.1f} utt/s",
              flush=True)
        return dt

    if args.parts:
        feat_fn = jax.jit(lambda w: stft_features(w, feat_cfg))
        timed("features", feat_fn, wave)
        fwd = jax.jit(lambda s, f: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, f, m0, False))
        feats = feat_fn(wave)
        timed("forward", fwd, state, feats)

    step = jax.jit(pretrain_step_body(model, feat_cfg), donate_argnums=())
    key = jax.random.key(2)
    timed(f"full step (bs={args.bs})", step, state, wave, 1e-3, key)


if __name__ == "__main__":
    main()
