"""Round-9 profile: component-level fwd+bwd cost at full size.

Isolates: features, CNN front-ends, conformer stacks, decoder MLP, loss
machinery — each as its own jitted grad step — against the full train step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.models.encoder import CNNFrontEnd
from sarssl_tpu.models.conformer import ConformerEncoder
from sarssl_tpu.models.decoder import EmbedDecoder
from sarssl_tpu.ops import FeatureConfig, gen_patch_mask, stft_features
from sarssl_tpu.train import create_train_state
from sarssl_tpu.train.steps import pretrain_step_body

BATCH = 128
NSAMPLE = 65792
ITERS = 5
DT = jnp.bfloat16


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # scalar sync, not a full fetch
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # scalar sync, not a full fetch
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.1f} ms  ({BATCH/dt:7.1f} utt/s-equiv)",
          flush=True)
    return dt


def grad_step(module, x, train=True, extra=None):
    v = module.init({"params": jax.random.key(0)}, x, train)

    def loss_fn(params):
        out = module.apply({"params": params,
                            "batch_stats": v.get("batch_stats", {})},
                           x, train, mutable=["batch_stats"] if train else [],
                           rngs={"dropout": jax.random.key(1)})
        y = out[0] if isinstance(out, tuple) else out
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    return jax.jit(jax.grad(loss_fn)), v["params"]


def main():
    feat_cfg = FeatureConfig()
    cfg = SARSSLConfig(dtype="bfloat16", fused_attention=True)
    model = SARSSL(cfg)
    nf, nt, nreim, nmic = cfg.sig_shape
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, NSAMPLE, 2), np.float32) * .05)

    # full step
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    m0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    step = jax.jit(pretrain_step_body(model, feat_cfg), donate_argnums=(0,))
    s, m = step(state, wave, 1e-3, jax.random.key(2))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        s, m = step(s, wave, 1e-3, jax.random.fold_in(jax.random.key(2), i))
    float(m["loss"])
    full = (time.perf_counter() - t0) / ITERS
    print(f"{'FULL train step':34s} {full*1e3:8.1f} ms  ({BATCH/full:7.1f} utt/s)",
          flush=True)
    del s, state

    # features
    feats_fn = jax.jit(lambda w: stft_features(w, feat_cfg))
    timed("stft_features (fwd)", feats_fn, wave)
    feats = feats_fn(wave)

    # CNN front-end fwd+bwd (one encoder; model runs two at these dims)
    tf = jnp.asarray(rng.standard_normal((BATCH, 256, 256, 4)), DT)
    for dembed, tag in ((512, "spec"), (256, "spat")):
        front = CNNFrontEnd(dembed, (256, 1), dtype=DT)
        g, p = grad_step(front, tf)
        timed(f"CNN front {tag} (fwd+bwd)", g, p)

    # conformer stacks fwd+bwd
    for d, layers, tag in ((512, 1, "spec"), (256, 3, "spat")):
        enc = ConformerEncoder(d, layers, num_heads=4, ff_expansion=4,
                               fused_attention=True, dtype=DT)
        x = jnp.asarray(rng.standard_normal((BATCH, 256, d)), DT)
        g, p = grad_step(enc, x)
        timed(f"conformer {tag} x{layers} (fwd+bwd)", g, p)

    # decoder MLP fwd+bwd
    dec = EmbedDecoder((256, 256, 2, 2), (256, 1), 768, dtype=DT)
    e = jnp.asarray(rng.standard_normal((BATCH, 256, 768)), DT)
    g, p = grad_step(dec, e)
    timed("decoder MLP (fwd+bwd)", g, p)


if __name__ == "__main__":
    main()
