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


def main(argv=None):
    # --base: a campaign dir of <task>_<mode>[ _suffix] run dirs (e.g.
    # exp/ds_r3/lowdata, exp/ds_r3/ism); floors fall back to the parent's
    # wo_info_baselines.json (same held-out test split → same floors)
    args = (argv if argv is not None else sys.argv[1:])
    base = os.path.join(REPO, "exp", "ds_r3")
    if "--base" in args:
        i = args.index("--base") + 1
        if i >= len(args) or args[i].startswith("--"):
            print("usage: collect_flagship.py [--base CAMPAIGN_DIR]",
                  file=sys.stderr)
            return 2
        base = os.path.abspath(args[i])
    fp = os.path.join(base, "wo_info_baselines.json")
    if not os.path.exists(fp):
        fp = os.path.join(os.path.dirname(base), "wo_info_baselines.json")
    with open(fp) as f:
        floors = json.load(f)
    out = {}
    for task in ("TDOA", "T60"):
        row = {"no_train_mae": floors[task]["mae_test"],
               "unit": floors[task]["unit"]}
        for mode in ("finetune", "lineareval", "scratchlow"):
            # merge cells from the main run dir plus any rerun dirs
            # (<task>_<mode>_<suffix>, e.g. _t01 trial subsets or _full):
            # grid cells are independent, keyed by their true trial index,
            # so they compose into one grid; sorted order means later
            # (rerun) dirs override a cell from an earlier degraded run.
            # Finished-chunk partials stand in when a run was killed
            # before its final dump.
            cells = {}
            sources = []
            prefix = f"{task}_{mode}"
            for name in sorted(os.listdir(base)):
                if name != prefix and not name.startswith(prefix + "_"):
                    continue
                d = os.path.join(base, name)
                p = os.path.join(d, "results.json")
                pp = os.path.join(d, "results.partial.json")
                if os.path.exists(p):
                    with open(p) as f:
                        cells.update(json.load(f)["cells"])
                    sources.append(name)
                elif os.path.exists(pp):
                    with open(pp) as f:
                        cells.update(json.load(f))
                    sources.append(name + " (partial)")
            if not cells:
                row[mode] = None
                continue
            # reference selection rule: best (bs, lr) config by mean val
            # MAE over its completed trials
            bycfg = {}
            for c in cells.values():
                bycfg.setdefault(f"bs{c['bs']}_lr{c['lr']:g}", []).append(c)
            summ = {k: {"mean_val_mae": sum(x["val_mae"] for x in v) / len(v),
                        "mean_test_mae": sum(x["test_mae"] for x in v) / len(v),
                        "ntrials": len(v)}
                    for k, v in bycfg.items()}
            # exclude configs whose mean val MAE is non-finite (a diverged
            # trial): min() with a NaN key is comparison-order-dependent
            finite = {k: v for k, v in summ.items()
                      if v["mean_val_mae"] == v["mean_val_mae"]}
            best = min(finite or summ,
                       key=lambda k: summ[k]["mean_val_mae"])
            # surface budget truncation: cells the grid runner flagged as
            # stopped by the prorated deadline before early-stopping
            trunc = sorted({c["trial"] for c in bycfg[best]
                            if c.get("truncated")})
            row[mode] = {"best_cfg": best,
                         "mean_val_mae": summ[best]["mean_val_mae"],
                         "test_mae": summ[best]["mean_test_mae"],
                         "ntrials": summ[best]["ntrials"],
                         "sources": sources}
            if trunc:
                row[mode]["truncated_trials"] = trunc
        ft, sc = row.get("finetune"), row.get("scratchlow")
        if ft and sc:
            row["finetune_beats_scratch"] = ft["test_mae"] < sc["test_mae"]
            row["scratch_beats_no_train"] = (sc["test_mae"]
                                             < row["no_train_mae"])
            row["finetune_vs_scratch_pct"] = round(
                100 * (1 - ft["test_mae"] / sc["test_mae"]), 1)
        out[task] = row
    # hand-written honesty notes (e.g. legacy runs whose cells predate the
    # per-cell 'truncated' flag): caveats.json maps task -> mode -> note
    cav_path = os.path.join(base, "caveats.json")
    if os.path.exists(cav_path):
        with open(cav_path) as f:
            for task, modes in json.load(f).items():
                for mode, note in modes.items():
                    if out.get(task, {}).get(mode):
                        out[task][mode]["caveat"] = note
    with open(os.path.join(base, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    sys.exit(main())
