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

CAMPAIGNS = [
    ("flagship (device-synth ckpt, 800 labels)", "exp/ds_r3/summary.json"),
    ("generator-gap (ISM ckpt, 800 labels)", "exp/ds_r3/ism/summary.json"),
    ("low-label (ISM ckpt, 200 fixed labels)",
     "exp/ds_r3/lowdata/summary.json"),
    ("CTF pretrain, 25-epoch truncated ckpt (r4, 800 labels)",
     "exp/ds_r4/ctf/summary.json"),
    ("CTF pretrain seed 100, full 30-epoch ckpt (r5, 800 labels)",
     "exp/ds_r5/ctf/summary.json"),
    ("CTF pretrain seed 101, full 30-epoch ckpt (r5, 800 labels)",
     "exp/ds_r5/ctf_s101/summary.json"),
    ("CTF seed-100 ckpt, low-label (r5, 200 fixed labels)",
     "exp/ds_r5/ctf_lowdata/summary.json"),
]
MODES = ("lineareval", "scratchlow", "finetune")


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
        p = os.path.join(REPO, rel)
        if not os.path.exists(p):
            lines.append(f"_{label}: no summary yet ({rel})_")
            continue
        with open(p) as f:
            loaded.append((label, json.load(f)))
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
