"""The experiment-summary scripts (scripts/collect_flagship.py,
scripts/campaign_table.py) produce the campaign tables cited in docs —
pin their selection/merge rules so a silent schema drift can't corrupt
the reported numbers.

No reference counterpart for collect_flagship (the reference saves .mat
grids and tabulates offline via code_v1/read_dsmat_bslr.py — that parser's
equivalent lives in sarssl_tpu/utils/results.py; these scripts sit above
it at the campaign level).
"""
import importlib.util
import json
import os
import sys

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _cell(trial, lr, val, test, truncated=False):
    return {"val_mae": val, "test_mae": test, "lr": lr, "bs": 8,
            "trial": trial, "epochs_run": 10, "truncated": truncated}


def _write_campaign(base):
    os.makedirs(os.path.join(base, "TDOA_finetune"))
    os.makedirs(os.path.join(base, "TDOA_finetune_rerun"))
    os.makedirs(os.path.join(base, "TDOA_scratchlow"))
    json.dump({"TDOA": {"unit": "samples", "mae_test": 2.9, "mean": 0.0},
               "T60": {"unit": "s", "mae_test": 0.19, "mean": 0.9}},
              open(os.path.join(base, "wo_info_baselines.json"), "w"))
    # main run: lr 1e-3 better on val for both trials; trial 1 truncated
    json.dump({"cells": {
        "trial0_bs8_lr0.001": _cell(0, 1e-3, 0.30, 0.31),
        "trial0_bs8_lr0.0001": _cell(0, 1e-4, 0.50, 0.45),
        "trial1_bs8_lr0.001": _cell(1, 1e-3, 0.34, 0.33, truncated=True),
        "trial1_bs8_lr0.0001": _cell(1, 1e-4, 0.52, 0.47),
    }}, open(os.path.join(base, "TDOA_finetune", "results.json"), "w"))
    # rerun dir: overrides trial 1's lr 1e-3 cell (untruncated, better)
    json.dump({"cells": {
        "trial1_bs8_lr0.001": _cell(1, 1e-3, 0.32, 0.29),
    }}, open(os.path.join(base, "TDOA_finetune_rerun", "results.json"), "w"))
    json.dump({"cells": {
        "trial0_bs8_lr0.001": _cell(0, 1e-3, 0.40, 0.41),
        "trial1_bs8_lr0.001": _cell(1, 1e-3, 0.42, 0.39),
    }}, open(os.path.join(base, "TDOA_scratchlow", "results.json"), "w"))


def test_collect_flagship_selection_and_merge(tmp_path):
    base = str(tmp_path / "campaign")
    _write_campaign(base)
    collect = _load("collect_flagship")
    assert collect.main(["--base", base]) is None
    out = json.load(open(os.path.join(base, "summary.json")))
    row = out["TDOA"]
    assert row["no_train_mae"] == 2.9
    ft = row["finetune"]
    # best config by MEAN val MAE over trials: lr 1e-3
    assert ft["best_cfg"] == "bs8_lr0.001"
    assert ft["ntrials"] == 2
    # the rerun dir's trial-1 cell replaced the truncated one
    assert abs(ft["test_mae"] - (0.31 + 0.29) / 2) < 1e-9
    assert "truncated_trials" not in ft
    assert "TDOA_finetune_rerun" in ft["sources"]
    # derived claims
    assert row["finetune_beats_scratch"] is True
    assert row["scratch_beats_no_train"] is True
    assert row["finetune_vs_scratch_pct"] == -25.0 or \
        row["finetune_vs_scratch_pct"] == 25.0
    # lineareval absent -> None, T60 row has no runs at all
    assert row["lineareval"] is None
    assert out["T60"]["finetune"] is None


def test_collect_flagship_truncation_and_caveats(tmp_path):
    base = str(tmp_path / "c2")
    os.makedirs(os.path.join(base, "T60_finetune"))
    json.dump({"TDOA": {"unit": "samples", "mae_test": 2.9, "mean": 0.0},
               "T60": {"unit": "s", "mae_test": 0.19, "mean": 0.9}},
              open(os.path.join(base, "wo_info_baselines.json"), "w"))
    json.dump({"cells": {
        "trial0_bs8_lr0.001": _cell(0, 1e-3, 0.08, 0.09, truncated=True),
        # diverged config must never win best-by-val even though NaN
        # compares weirdly
        "trial0_bs8_lr0.01": _cell(0, 1e-2, float("nan"), float("nan")),
    }}, open(os.path.join(base, "T60_finetune", "results.json"), "w"))
    json.dump({"T60": {"finetune": "chunk killed at epoch 51"}},
              open(os.path.join(base, "caveats.json"), "w"))
    collect = _load("collect_flagship")
    collect.main(["--base", base])
    row = json.load(open(os.path.join(base, "summary.json")))["T60"]
    assert row["finetune"]["best_cfg"] == "bs8_lr0.001"
    assert row["finetune"]["truncated_trials"] == [0]
    assert row["finetune"]["caveat"] == "chunk killed at epoch 51"


def test_campaign_table_renders_loaded_summaries(tmp_path, capsys):
    table = _load("campaign_table")
    # point one campaign at a synthetic summary, silence the others
    base = str(tmp_path / "c3")
    _write_campaign(base)
    _load("collect_flagship").main(["--base", base])
    old = table.CAMPAIGNS
    try:
        table.CAMPAIGNS = [("synthetic", os.path.relpath(
            os.path.join(base, "summary.json"), table.REPO))]
        table.main([])
    finally:
        table.CAMPAIGNS = old
    out = capsys.readouterr().out
    assert "| synthetic |" in out
    assert "2.9" in out          # floor
    assert "+25.0%" in out or "-25.0%" in out

def test_trial_stats_selects_by_val_and_merges(tmp_path, capsys):
    stats = _load("trial_stats")
    a = str(tmp_path / "a.json")
    b = str(tmp_path / "b.json")
    json.dump({"cells": {
        # trial 0: lr 1e-3 wins on VAL though lr 1e-4 has the lower TEST —
        # selection must be by val (the protocol can't peek at test)
        "trial0_bs8_lr0.001": _cell(0, 1e-3, 0.30, 0.40),
        "trial0_bs8_lr0.0001": _cell(0, 1e-4, 0.35, 0.20),
        "trial1_bs8_lr0.001": _cell(1, 1e-3, 0.50, 0.60),
    }}, open(a, "w"))
    # second file overrides trial 1's cell (merge = dict update order)
    json.dump({"cells": {
        "trial1_bs8_lr0.001": _cell(1, 1e-3, 0.30, 0.20),
    }}, open(b, "w"))
    trials, tests, lrs = stats.per_trial_best([a, b])
    assert trials == [0, 1]
    assert tests == [0.40, 0.20]
    assert lrs == [1e-3, 1e-3]
    assert stats.main([f"x={a},{b}", f"y={a}"]) == 0
    out = capsys.readouterr().out
    # mean over per-trial tests: x = (0.40+0.20)/2 = 0.30, y = 0.50
    assert "x: mean 0.3000 +/- 0.1000 (n=2)" in out
    assert "y: mean 0.5000" in out
    assert "x vs y: -40.0%" in out
