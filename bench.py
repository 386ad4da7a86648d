"""Benchmark: pretrain utterances/sec/chip for the flagship SARSSL model.

Runs the full-size configuration from the reference drivers
(/root/reference/code/run_pretrain.py:66-79): batch 128, T=4.112 s @ 16 kHz
2-mic waveforms, STFT (512/256/512), dual MC-Conformer encoders
(spec d=512 x1, spat d=256 x3) and the MLP decoder — one fused jitted train
step (features + masking + fwd + bwd + Adam), bf16 compute / f32 params, with
the Pallas fused attention kernel and fused XLA counter-hash dropout masks.

Prints ONE JSON line:
  {"metric": "pretrain_utts_per_sec_per_chip", "value": N, "unit": "utt/s",
   "vs_baseline": N, "step_ms": N, "step_tflop": N, "mfu": N}

step_tflop comes from XLA cost analysis of the compiled train step; mfu is
measured TFLOP/s over PEAK_FLOPS (v5e bf16 peak 197 TF/s per chip; override
with SARSSL_PEAK_FLOPS for other silicon). Both are null if the backend
exposes no cost model.

vs_baseline compares against REFERENCE_GPU_UPS, an estimate of the PyTorch
reference's single-A100 throughput (the repo publishes no numbers). The
full model behind the 130 utt/s — FLOP count, per-op precision on A100,
utilization ranges, eager overheads, and a same-silicon CPU cross-check
against the actual torch reference — lives in BASELINE.md ("The
vs_baseline denominator"). The BASELINE.json north star is vs_baseline >= 5.
"""
import json
import os
import threading
import time

import numpy as np

REFERENCE_GPU_UPS = 130.0
PEAK_FLOPS = 197e12  # TPU v5e bf16 peak per chip; SARSSL_PEAK_FLOPS overrides

BATCH = 128
NSAMPLE = 65792  # 4.112 s @ 16 kHz -> 256 STFT frames
WARMUP = 5
ITERS = 20


def _arm_watchdog(deadline_s: float = 1500.0):
    """The axon tunnel can drop mid-run (observed twice on 2026-08-20),
    leaving the client waiting forever on a lost in-flight execute. A
    hung bench records nothing; emit an honest failure JSON instead so
    the round artifact exists either way. Cancelled on success."""
    def fire():
        print(json.dumps({
            "metric": "pretrain_utts_per_sec_per_chip", "value": None,
            "unit": "utt/s", "vs_baseline": None,
            "error": f"watchdog: no result within {deadline_s:.0f}s "
                     "(axon tunnel drop?)"}), flush=True)
        os._exit(0)
    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def main():
    wd = _arm_watchdog(float(os.environ.get("SARSSL_BENCH_DEADLINE", 1500)))
    import jax
    import jax.numpy as jnp

    from sarssl_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
    from sarssl_tpu.train import create_train_state, make_pretrain_step

    dev = jax.devices()[0]
    cfg = SARSSLConfig(dtype="bfloat16", fused_attention=True)
    model = SARSSL(cfg)
    feat_cfg = FeatureConfig()

    nf, nt, nreim, nmic = cfg.sig_shape
    x0 = jnp.zeros((BATCH, nmic, nf, nt, nreim), jnp.float32)
    mask0 = gen_patch_mask(jax.random.key(0), BATCH, cfg.npatch,
                           cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, mask0)
    step = make_pretrain_step(model, feat_cfg, donate=True)

    rng = np.random.default_rng(0)
    wave = jax.device_put(
        jnp.asarray(rng.standard_normal((BATCH, NSAMPLE, 2), np.float32) * 0.05),
        dev)

    key = jax.random.key(2)
    step_flops = None
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wave, 1e-3, sub)
    # NOTE: jax.block_until_ready does not synchronize on the axon TPU
    # tunnel backend; a host fetch of the scalar loss does.
    float(metrics["loss"])
    try:  # FLOPs of the already-jitted step (persistent cache: no recompile)
        cost = step.lower(state, wave, 1e-3, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        step_flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wave, 1e-3, sub)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    peak = float(os.environ.get("SARSSL_PEAK_FLOPS", PEAK_FLOPS))
    step_s = dt / ITERS
    ups = BATCH * ITERS / dt
    wd.cancel()
    print(json.dumps({
        "metric": "pretrain_utts_per_sec_per_chip",
        "value": round(ups, 2),
        "unit": "utt/s",
        "vs_baseline": round(ups / REFERENCE_GPU_UPS, 3),
        "step_ms": round(step_s * 1e3, 2),
        "step_tflop": round(step_flops / 1e12, 3) if step_flops else None,
        "mfu": round(step_flops / step_s / peak, 4) if step_flops else None,
    }))


if __name__ == "__main__":
    main()
