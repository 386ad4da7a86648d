"""Measure the vmapped/scanned-grid speedup vs the sequential cell loop.

Times one full downstream grid epoch — 16 (trial, lr) cells x (train steps +
val eval) at the reference sim settings (bs 8, lr set x4, ntrial 4, TDOA,
full dims) — three ways in ONE process (so each path pays its own compile
once and timing excludes it):

  sequential: 16 cells stepped one after another (reference semantics,
              run_downstream.py:115-166)
  vmapped:    all 16 cells as lanes of one program, one dispatch per step
              (train/grid.py make_vmapped_downstream_steps)
  scanned:    the production path — 25-step lax.scan blocks with per-trial
              data slots (train/grid.py make_scanned_downstream_steps),
              amortizing the ~0.1 s/step tunnel latency+transfer cost

Run (after generating + packing data/simu_ds): python scripts/profile_grid_vmap.py
Writes GRID_VMAP_r4.json at the repo root (the restored r3-weak-#3 measurement).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

NCELL = 16
BS = 8
TRAIN_NUM = 800
VAL_NUM = 1000
LRS = [1e-3, 5e-4, 1e-4, 5e-5] * 4  # 4 lrs x 4 trials


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[0]


def main():
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig
    from sarssl_tpu.train import (create_train_state, make_downstream_step,
                                  make_downstream_eval_step)
    from sarssl_tpu.train.grid import make_vmapped_downstream_steps, stack_states
    from sarssl_tpu.data import PackedDataset

    fs, T = 16000, 1.04
    nsample = round(T * fs)
    feat_cfg = FeatureConfig()
    nt = feat_cfg.num_frames(nsample)
    cfg = SARSSLConfig(sig_shape=(256, nt, 2, 2), dtype="float32",
                       pretrain=False)
    model = SARSSL(cfg)

    x0 = jnp.zeros((BS, 2, 256, nt, 2), jnp.float32)
    st0 = create_train_state(model, jax.random.key(0), x0, None)

    tr = PackedDataset("data/simu_ds_packed/train")
    va = PackedDataset("data/simu_ds_packed/val")
    train_b = [(w[:, :nsample], np.asarray(l["TDOA"], np.float32) * fs)
               for w, l in list(tr.iter_batches(BS, shuffle=True, seed=1)
                                )[: TRAIN_NUM // BS]]
    val_b = [(w[:, :nsample], np.asarray(l["TDOA"], np.float32) * fs)
             for w, l in list(va.iter_batches(BS))[: VAL_NUM // BS]]
    print(f"{len(train_b)} train batches, {len(val_b)} val batches")

    # --- sequential ------------------------------------------------------
    step = make_downstream_step(model, feat_cfg, task="TDOA", donate=False)
    ev = make_downstream_eval_step(model, feat_cfg, task="TDOA")
    states = [st0] * NCELL
    key = jax.random.key(1)

    def seq_epoch():
        nonlocal states
        out = None
        for c in range(NCELL):
            s = states[c]
            for w, g in train_b:
                s, m = step(s, jnp.asarray(w), jnp.asarray(g), LRS[c],
                            jax.random.fold_in(key, c))
            for w, g in val_b:
                out = ev(s, jnp.asarray(w), jnp.asarray(g))
            states[c] = s
        _sync(out)

    t0 = time.perf_counter(); seq_epoch()
    compile_seq = time.perf_counter() - t0
    t0 = time.perf_counter(); seq_epoch()
    t_seq = time.perf_counter() - t0
    print(f"sequential: {t_seq:.1f} s/grid-epoch (first pass incl. compile "
          f"{compile_seq:.1f} s)")

    # --- vmapped ---------------------------------------------------------
    vstep, vev = make_vmapped_downstream_steps(model, feat_cfg, task="TDOA")
    sts = stack_states([st0] * NCELL)
    lrs = jnp.asarray(LRS, jnp.float32)
    keys = jnp.stack([jax.random.fold_in(key, c) for c in range(NCELL)])

    def vmap_epoch(sts):
        out = None
        for w, g in train_b:
            sts, m = vstep(sts, jnp.asarray(np.stack([w] * NCELL)),
                           jnp.asarray(np.stack([g] * NCELL)), lrs, keys)
        for w, g in val_b:
            out = vev(sts, jnp.asarray(w), jnp.asarray(g))
        _sync(out)
        return sts

    t0 = time.perf_counter(); sts = vmap_epoch(sts)
    compile_v = time.perf_counter() - t0
    t0 = time.perf_counter(); sts = vmap_epoch(sts)
    t_v = time.perf_counter() - t0
    print(f"vmapped:    {t_v:.1f} s/grid-epoch (first pass incl. compile "
          f"{compile_v:.1f} s)")

    # --- scanned (production path) ---------------------------------------
    # Free the sequential and vmapped grid states before compiling the third
    # program: keeping all three 16-cell states resident OOMed the chip
    # (chain15, 2026-08-19 — see GRID_VMAP_r4.json).
    for _s in states:
        jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None, _s)
    states = None
    jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None, sts)
    sts = None
    from sarssl_tpu.train.grid import make_scanned_downstream_steps, _blocks
    K = 25
    NTRIAL = 4
    lane_slots = [c // 4 for c in range(NCELL)]  # 4 lr lanes per trial slot
    strain, sev, _sres = make_scanned_downstream_steps(model, feat_cfg, task="TDOA",
                                                lane_slots=lane_slots)
    sts2 = stack_states([st0] * NCELL)
    keys0 = jnp.stack([jax.random.fold_in(key, c) for c in range(NCELL)])

    def per_trial_stream():
        for w, g in train_b:
            yield (np.stack([w] * NTRIAL), np.stack([g] * NTRIAL))

    def scan_epoch(sts):
        rngs = keys0
        out = None
        for wb, gb in _blocks(per_trial_stream(), K):
            sts, rngs, ls, ms = strain(sts, rngs, wb, gb, lrs)
        for wb, gb in _blocks(iter(val_b), K):
            out = sev(sts, wb, gb)
        _sync(out)
        return sts

    t0 = time.perf_counter(); sts2 = scan_epoch(sts2)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); sts2 = scan_epoch(sts2)
    t_s = time.perf_counter() - t0
    print(f"scanned:    {t_s:.1f} s/grid-epoch (first pass incl. compile "
          f"{compile_s:.1f} s)")

    out = {"ncell": NCELL, "bs": BS, "task": "TDOA nt=64 full dims",
           "sequential_s_per_grid_epoch": round(t_seq, 2),
           "vmapped_s_per_grid_epoch": round(t_v, 2),
           "scanned_s_per_grid_epoch": round(t_s, 2),
           "scan_block": K,
           "speedup": round(t_seq / t_v, 2),
           "speedup_scanned": round(t_seq / t_s, 2)}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GRID_VMAP_r4.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
