"""Collect the r3 flagship downstream results into exp/ds_r3/summary.json.

For each task (TDOA, T60) and mode (finetune/lineareval/scratchlow), reads
exp/ds_r3/<task>_<mode>/results.json, takes the best (bs, lr) config by
mean val MAE (the reference's selection rule), and tabulates against the
predict-train-mean floor (wo_info_baselines.json). The flagship claim is
finetune MAE < scratchlow MAE < no-train MAE.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    base = os.path.join(REPO, "exp", "ds_r3")
    with open(os.path.join(base, "wo_info_baselines.json")) as f:
        floors = json.load(f)
    out = {}
    for task in ("TDOA", "T60"):
        row = {"no_train_mae": floors[task]["mae_test"],
               "unit": floors[task]["unit"]}
        for mode in ("finetune", "lineareval", "scratchlow"):
            d = os.path.join(base, f"{task}_{mode}")
            p = os.path.join(d, "results.json")
            if os.path.exists(p):
                with open(p) as f:
                    r = json.load(f)
                best = r["best"]
                row[mode] = {"best_cfg": best,
                             "mean_val_mae": r["summary"][best]["mean_val_mae"],
                             "test_mae": r["summary"][best]["mean_test_mae"]}
                continue
            # run killed before the final dump: recover finished chunks.
            # Selection rule unchanged (best mean val MAE over trials of a
            # (bs, lr) config), just over the cells that completed.
            pp = os.path.join(d, "results.partial.json")
            if not os.path.exists(pp):
                row[mode] = None
                continue
            with open(pp) as f:
                cells = json.load(f)
            bycfg = {}
            for c in cells.values():
                bycfg.setdefault(f"bs{c['bs']}_lr{c['lr']:g}",
                                 []).append(c)
            if not bycfg:
                row[mode] = None
                continue
            summ = {k: {"mean_val_mae": sum(x["val_mae"] for x in v) / len(v),
                        "mean_test_mae": sum(x["test_mae"] for x in v) / len(v),
                        "ntrials_done": len(v)}
                    for k, v in bycfg.items()}
            best = min(summ, key=lambda k: summ[k]["mean_val_mae"])
            row[mode] = {"best_cfg": best,
                         "mean_val_mae": summ[best]["mean_val_mae"],
                         "test_mae": summ[best]["mean_test_mae"],
                         "partial": True}
        ft, sc = row.get("finetune"), row.get("scratchlow")
        if ft and sc:
            row["finetune_beats_scratch"] = ft["test_mae"] < sc["test_mae"]
            row["scratch_beats_no_train"] = (sc["test_mae"]
                                             < row["no_train_mae"])
            row["finetune_vs_scratch_pct"] = round(
                100 * (1 - ft["test_mae"] / sc["test_mae"]), 1)
        out[task] = row
    with open(os.path.join(base, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    sys.exit(main())
