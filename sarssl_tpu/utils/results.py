"""Downstream result-grid readers.

Equivalent of /root/reference/code_v1/read_dsmat_bslr.py: parse the per-cell
results saved by run_downstream (results.json / results.mat) into final MAE
tables over the lr x bs grid and across trials.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List



def read_results(exp_dir: str) -> Dict:
    path = os.path.join(exp_dir, "results.json")
    with open(path) as f:
        return json.load(f)


def mae_table(exp_dirs: List[str], metric: str = "test_mae") -> Dict[str, Dict]:
    """Per-experiment best-config MAE summary: task -> {best cfg, mae,
    per-config means} (the reference prints this from the .mat grids)."""
    out = {}
    for d in exp_dirs:
        r = read_results(d)
        out[r.get("task", os.path.basename(d))] = {
            "best_config": r["best"],
            "best_test_mae": r["best_test_mae"],
            "grid": {k: v[f"mean_{metric}"] if f"mean_{metric}" in v
                     else v.get("mean_test_mae")
                     for k, v in r["summary"].items()},
        }
    return out


def print_mae_table(exp_dirs: List[str]):
    table = mae_table(exp_dirs)
    width = max(len(t) for t in table) + 2
    print(f"{'task':{width}s} {'best config':>16s} {'test MAE':>12s}")
    for task, row in table.items():
        print(f"{task:{width}s} {row['best_config']:>16s} "
              f"{row['best_test_mae']:>12.5f}")
