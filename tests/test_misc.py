"""Misc: moving-source trajectory conv, prefetch, results reader, StepTimer."""
import json
import os

import numpy as np
import pytest

from sarssl_tpu.data.ism import rir_conv_src, _conv_trajectory
from sarssl_tpu.data.prefetch import device_prefetch
from sarssl_tpu.utils.results import read_results, mae_table
from sarssl_tpu.utils.profiling import StepTimer


def test_conv_trajectory_static_equals_single():
    """A 'moving' source whose trajectory points share one RIR must equal
    the static convolution."""
    rng = np.random.default_rng(0)
    h = rng.standard_normal((2, 64)).astype(np.float64) * 0.2  # (nmic, nsamp)
    src = rng.standard_normal(500)
    static = rir_conv_src(h[None, :, :, None], src[:, None])[0]
    moving_rirs = np.stack([h, h, h])  # 3 identical trajectory points
    moving = _conv_trajectory(moving_rirs, src)
    np.testing.assert_allclose(moving, static, atol=1e-10)


def test_conv_trajectory_interpolates():
    src = np.zeros(100)
    src[10] = 1.0
    h0 = np.zeros((1, 8)); h0[0, 0] = 1.0    # identity
    h1 = np.zeros((1, 8)); h1[0, 0] = 3.0    # 3x gain
    out = _conv_trajectory(np.stack([h0, h1]), src)
    # at sample 10 of 100 with 2 points the crossfade weight toward h1 is
    # ~0.2 -> gain ~1.4; pin it so position-independent or reversed blends
    # (gain 2.0 / 2.6) fail
    assert out[10, 0] == pytest.approx(1.4, abs=0.25)


def test_device_prefetch_order():
    batches = [np.full((2, 2), i) for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b), batches[i])


def test_results_reader(tmp_path):
    r = {"task": "TDOA", "cells": {}, "best": "bs8_lr0.001",
         "best_test_mae": 1.5,
         "summary": {"bs8_lr0.001": {"mean_val_mae": 1.0,
                                     "mean_test_mae": 1.5}}}
    d = tmp_path / "exp"
    d.mkdir()
    with open(d / "results.json", "w") as f:
        json.dump(r, f)
    table = mae_table([str(d)])
    assert table["TDOA"]["best_test_mae"] == 1.5


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        t.stop()
    s = t.summary(items_per_step=10)
    assert s["items_per_sec"] > 0 and s["mean_ms"] >= 0


def test_collect_flagship_merges_rerun_dirs(tmp_path, monkeypatch):
    """collect_flagship composes one grid from the main run dir plus any
    <task>_<mode>_<suffix> rerun dirs: sorted order lets a clean rerun
    override cells a degraded earlier run produced, finished-chunk
    partials stand in for killed runs, and the best (bs, lr) config is
    picked by mean val MAE over its merged trials."""
    import importlib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    cf = importlib.import_module("collect_flagship")

    base = tmp_path / "exp" / "ds_r3"
    base.mkdir(parents=True)
    (base / "wo_info_baselines.json").write_text(json.dumps(
        {"TDOA": {"mae_test": 3.0, "unit": "samples"},
         "T60": {"mae_test": 0.2, "unit": "s"}}))

    def cell(trial, lr, val, test):
        return {f"trial{trial}_bs8_lr{lr:g}": {
            "val_mae": val, "test_mae": test, "lr": lr, "bs": 8,
            "trial": trial}}

    # main dir: killed run, only a partial with a degraded trial-0 cell
    d = base / "TDOA_finetune"
    d.mkdir()
    (d / "results.partial.json").write_text(json.dumps(
        cell(0, 1e-3, 9.0, 9.0)))
    # clean rerun of trial 0 (must override) + a _full-suffix dir (trial 1)
    d = base / "TDOA_finetune_t0r"
    d.mkdir()
    (d / "results.json").write_text(json.dumps(
        {"cells": cell(0, 1e-3, 0.4, 0.41)}))
    d = base / "TDOA_finetune_full"
    d.mkdir()
    (d / "results.json").write_text(json.dumps(
        {"cells": cell(1, 1e-3, 0.6, 0.59)}))
    d = base / "TDOA_scratchlow"
    d.mkdir()
    (d / "results.json").write_text(json.dumps(
        {"cells": {**cell(0, 1e-3, 0.8, 0.82), **cell(1, 1e-3, 0.7, 0.7)}}))

    monkeypatch.setattr(cf, "REPO", str(tmp_path))
    cf.main()
    out = json.loads((base / "summary.json").read_text())

    ft = out["TDOA"]["finetune"]
    assert ft["ntrials"] == 2 and ft["best_cfg"] == "bs8_lr0.001"
    # trial 0 comes from the rerun (0.41), not the degraded partial (9.0)
    assert abs(ft["test_mae"] - (0.41 + 0.59) / 2) < 1e-9
    assert out["TDOA"]["finetune_beats_scratch"] is True
    assert out["TDOA"]["scratch_beats_no_train"] is True
    assert out["T60"]["finetune"] is None
