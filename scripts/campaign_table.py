"""Render the round-3 downstream campaigns as one markdown comparison table.

Reads the per-campaign summary.json files written by collect_flagship.py:

  exp/ds_r3/summary.json          flagship   (device-synth pretrain ckpt,
                                              800 labels/epoch of a 2k pool)
  exp/ds_r3/ism/summary.json      generator-gap rerun (full-ISM pretrain
                                              ckpt, same labels as flagship)
  exp/ds_r3/lowdata/summary.json  low-label ablation (fixed 200 labels,
                                              ISM pretrain ckpt)

and prints, per task and campaign, the no-train floor and the best test
MAE per mode plus the finetune-vs-scratch delta. Campaigns whose summary
is missing (not yet collected) are skipped with a note.

Run: python scripts/campaign_table.py [--write docs/CAMPAIGNS_r3.md]
"""
import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# An entry's second element is one summary.json path or a list of them:
# a list renders as ONE campaign row whose mode columns are filled from
# the first summary that has each mode (the ep25 checkpoint's finetune
# arms ran in r4, its lineareval arms in r5 — same ckpt, same data, one
# campaign). The planned seed-100 full-30-epoch resume died with the r5
# environment reset (optimizer state unrecoverable from the f16 export),
# so that row is gone; seed 101 is the completed-30-epoch schedule.
CAMPAIGNS = [
    ("flagship (device-synth ckpt, 800 labels)", "exp/ds_r3/summary.json"),
    ("generator-gap (ISM ckpt, 800 labels)", "exp/ds_r3/ism/summary.json"),
    ("low-label (ISM ckpt, 200 fixed labels)",
     "exp/ds_r3/lowdata/summary.json"),
    ("CTF pretrain, ep25 seed-100 ckpt (800 labels; ft r4, LE r5)",
     ["exp/ds_r4/ctf/summary.json", "exp/ds_r5/ctf_ep25/summary.json"]),
    ("CTF pretrain seed 101, full 30-epoch ckpt (r5, 800 labels)",
     "exp/ds_r5/ctf_s101/summary.json"),
    ("CTF ep25 seed-100 ckpt, low-label (r5, 200 fixed labels)",
     "exp/ds_r5/ctf_ep25_lowdata/summary.json"),
]
MODES = ("lineareval", "scratchlow", "finetune")


def merge_rows(rows):
    """Mode-wise merge of one task's rows from several summaries: the
    first summary with a given mode wins; derived claims are recomputed
    from the merged modes."""
    out = dict(rows[0])
    for r in rows[1:]:
        for mode in MODES:
            if out.get(mode) is None and r.get(mode) is not None:
                out[mode] = r[mode]
    ft, sc = out.get("finetune"), out.get("scratchlow")
    if ft and sc:
        out["finetune_beats_scratch"] = ft["test_mae"] < sc["test_mae"]
        out["finetune_vs_scratch_pct"] = round(
            100 * (1 - ft["test_mae"] / sc["test_mae"]), 1)
    return out


def fmt(x, digits=4):
    return "—" if x is None else f"{x:.{digits}g}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", type=str, default=None,
                    help="also write the table to this markdown file")
    args = ap.parse_args(argv)

    lines = ["# Downstream campaigns — best test MAE by mode", ""]
    loaded = []
    for label, rel in CAMPAIGNS:
        rels = [rel] if isinstance(rel, str) else list(rel)
        summaries = []
        for r in rels:
            p = os.path.join(REPO, r)
            if os.path.exists(p):
                with open(p) as f:
                    summaries.append(json.load(f))
        if not summaries:
            lines.append(f"_{label}: no summary yet ({rels[0]})_")
            continue
        merged = {task: merge_rows([s[task] for s in summaries if task in s])
                  for task in ("TDOA", "T60")
                  if any(task in s for s in summaries)}
        loaded.append((label, merged))
    if lines[-1] != "":
        lines.append("")

    for task in ("TDOA", "T60"):
        avail = [(label, s[task]) for label, s in loaded if task in s]
        if not avail:
            continue
        unit = avail[0][1].get("unit", "")
        lines += [f"## {task} ({unit})", "",
                  "| campaign | floor | lineareval | scratchlow | finetune |"
                  " ft vs scratch |",
                  "|---|---|---|---|---|---|"]
        for label, row in avail:
            cells = [label, fmt(row.get("no_train_mae"))]
            for mode in MODES:
                m = row.get(mode)
                cells.append(fmt(m["test_mae"]) if m else "—")
            pct = row.get("finetune_vs_scratch_pct")
            cells.append("—" if pct is None else f"{pct:+.1f}%")
            lines.append("| " + " | ".join(cells) + " |")
        lines.append("")

    lines += ["## Protocol experiments (not mode comparisons)", ""]
    room_runs = [
        ("ISM ckpt", "exp/ds_r4/room_TDOA_finetune"),
        ("CTF seed-100 ckpt", "exp/ds_r5/room_ctf/TDOA_finetune"),
    ]
    any_room = False
    for ckpt_label, rel in room_runs:
        room_res = os.path.join(REPO, rel, "results.json")
        if not os.path.exists(room_res):
            continue
        any_room = True
        with open(room_res) as f:
            cells = json.load(f)["cells"].values()
        trials = sorted({c["trial"] for c in cells})
        best = [min(c["test_mae"] for c in cells if c["trial"] == t)
                for t in trials]
        mean = sum(best) / len(best)
        std = (sum((b - mean) ** 2 for b in best) / len(best)) ** 0.5
        lines += [
            "- **Room-subset trials** (reference run_downstream.py:173-181 "
            f"protocol, `--room-trials`): TDOA finetune from the {ckpt_label} "
            "on a 16-room certain-room corpus, "
            f"{len(trials)} disjoint 4-room trials of 400 utts each — "
            "best-per-trial test MAE "
            + "/".join(f"{b:.3f}" for b in best)
            + f" (mean {mean:.3f} ± {std:.3f}; the trial spread is room "
            f"variance by construction). `{rel}/`.",
            "",
        ]
    if not any_room:
        lines += ["_room-subset trials: no results yet "
                  "(exp/ds_r4/room_TDOA_finetune/)_", ""]
    out = "\n".join(lines)
    print(out)
    if args.write:
        with open(os.path.join(REPO, args.write), "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
