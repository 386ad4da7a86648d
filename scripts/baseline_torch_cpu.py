"""Same-silicon baseline: torch-reference step vs sarssl_tpu step on CPU.

BASELINE.md's `vs_baseline` denominator models the reference's A100
throughput from FLOP math. This script pins the *framework* part of that
model with a direct measurement on identical hardware: the actual reference
SARSSL (/root/reference/code/model.py:350-601, imported in place) and our
flax SARSSL run the same training step — features in, masked-pretext loss,
backward, Adam update — on this host's CPU, single thread, float32, full
dims (spec 512x1, spat 256x3, nf=256 nt=256).

Measured is the model step only (no STFT/data preprocess on either side),
which *favors* the reference: its per-batch Python masking loops run inside
net.forward and are counted, but its host-side STFT/rebatch preprocess
(learner.py:537-572) is not, while our production step fuses those on
device for free.

Writes BASELINE_CPU.json at the repo root.

Usage: python scripts/baseline_torch_cpu.py [--nb 4] [--iters 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_torch(x_np, nmasked, iters, warmup=1):
    import torch

    from sarssl_tpu.utils.torch_interop import load_reference_model_module

    torch.set_num_threads(1)
    torch.manual_seed(0)
    nb, nmic, nf, nt, nreim = x_np.shape
    mod = load_reference_model_module()
    net = mod.SARSSL(sig_shape=[nf, nt, nreim, nmic], patch_shape=(256, 1),
                     patch_mode="T", nmasked_patch=nmasked, pretrain=True,
                     device="cpu")
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    x = torch.from_numpy(x_np)

    def step():
        opt.zero_grad(set_to_none=True)
        loss = net(x)[0]
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return dt


def measure_jax(x_np, nmasked, iters, warmup=1):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import gen_patch_mask
    from sarssl_tpu.train import create_train_state

    nb, nmic, nf, nt, nreim = x_np.shape
    cfg = SARSSLConfig(sig_shape=(nf, nt, nreim, nmic), dtype="float32")
    model = SARSSL(cfg)
    x = jnp.asarray(x_np)
    m0 = gen_patch_mask(jax.random.key(0), nb, cfg.npatch, nmasked)
    state = create_train_state(model, jax.random.key(1), x, m0)

    @jax.jit
    def step(state, rng):
        rng_mask, rng_drop = jax.random.split(rng)
        mask = gen_patch_mask(rng_mask, nb, cfg.npatch, nmasked)

        def loss_fn(params):
            (loss, diff, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, mask, True, rngs={"dropout": rng_drop},
                mutable=["batch_stats"])
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return (state.apply_gradients(grads, lr=1e-3)
                .replace(batch_stats=mut["batch_stats"]), loss)

    key = jax.random.key(2)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((args.nb, 2, 256, 256, 2)).astype(np.float32)
    nmasked = 128

    dt_t = measure_torch(x_np, nmasked, args.iters)
    dt_j = measure_jax(x_np, nmasked, args.iters)
    out = {
        "config": f"full dims, nb={args.nb}, f32, 1 CPU thread, model-only "
                  "step (fwd+bwd+Adam incl. in-model masking)",
        "torch_reference_s_per_step": round(dt_t, 3),
        "jax_s_per_step": round(dt_j, 3),
        "torch_utt_per_s": round(args.nb / dt_t, 2),
        "jax_utt_per_s": round(args.nb / dt_j, 2),
        "same_silicon_speedup": round(dt_t / dt_j, 3),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE_CPU.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
