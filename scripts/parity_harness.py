"""Pretext reconstruction-MSE parity harness (BASELINE config 1).

Trains the tiny 2-ch pretext configuration on seeded synthetic mic pairs
with the reference training quirks enabled (--parity: fresh Adam per epoch,
reference learner.py:83) and records the final masked-reconstruction MSE.

The BASELINE criterion is "recon MSE within 1e-3 of reference" under the same
config and seeded data. The reference's torch pipeline cannot run in this
environment (CUDA/gpuRIR dependencies, broken common.NBC imports), so this
harness pins OUR number for regression tracking across rounds; run the same
recipe in a reference-capable environment to produce the torch-side number.

Run: python scripts/parity_harness.py [--epochs 5]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig, gen_patch_mask
    from sarssl_tpu.train import (create_train_state, make_pretrain_step,
                                  make_pretrain_eval_step, cosine_schedule,
                                  PretrainLearner)
    from sarssl_tpu.data import SyntheticPairs

    NSAMPLE = 16640
    feat = FeatureConfig()
    nt = feat.num_frames(NSAMPLE)
    cfg = SARSSLConfig(dtype="float32").tiny(
        sig_shape=(256, nt, 2, 2), patch_shape=(256, 1),
        spec_dembed=64, spat_dembed=32)
    model = SARSSL(cfg)
    x0 = jnp.zeros((8, 2, 256, nt, 2))
    m0 = gen_patch_mask(jax.random.key(0), 8, cfg.npatch,
                        cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(100), x0, m0)

    learner = PretrainLearner(
        state=state,
        train_step=make_pretrain_step(model, feat, donate=False),
        eval_step=make_pretrain_eval_step(model, feat),
        lr_schedule=cosine_schedule(args.epochs, 1e-3),
        fresh_opt_each_epoch=True,  # parity quirk
        patience=100)

    data = SyntheticPairs(nsample=NSAMPLE, seed=1)
    key = jax.random.key(7)
    for ep in range(args.epochs):
        tm = learner.train_epoch(data.batches(8, 16), jax.random.fold_in(key, ep))
        vm = learner.eval_epoch(data.batches(8, 4), jax.random.fold_in(key, 10_000 + ep))
        learner.end_epoch(vm["loss"])
        print(f"epoch {ep}: train {tm['loss']:.5f} val {vm['loss']:.5f}")

    result = {"config": "tiny-2ch-pretext-synthetic-seeded",
              "parity_mode": True,
              "epochs": args.epochs,
              "final_val_recon_mse": learner.history["val_loss"][-1]}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "PARITY.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
