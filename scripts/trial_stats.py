"""Per-trial best statistics for downstream grid results.

The reference protocol runs each (task, mode) as an ntrial x nlr grid and
reports the spread over trials (reference /root/reference/code/opt.py:205-214:
trials exist to measure variance; run_downstream.py:350-377 persists the full
grid). This tool reduces one or more ``results.json`` grids (merged, e.g. a
trial-subset split across runs) to the per-trial numbers a claim needs:

  for each trial: pick the lr cell with the lowest VAL mae (the selection the
  training protocol is allowed to make), report that cell's TEST mae;
  then mean +/- population std over trials.

Usage:
  python scripts/trial_stats.py LABEL=path/results.json[,more.json] ...

Prints one line per label and, with exactly two labels, the relative gap of
the first vs the second (negative = first is better).
"""
import json
import sys


def per_trial_best(paths):
    cells = {}
    for p in paths:
        with open(p) as f:
            cells.update(json.load(f)["cells"])
    by_trial = {}
    for name, c in cells.items():
        t = c["trial"]
        if t not in by_trial or c["val_mae"] < by_trial[t]["val_mae"]:
            by_trial[t] = c
    trials = sorted(by_trial)
    return trials, [by_trial[t]["test_mae"] for t in trials], \
        [by_trial[t]["lr"] for t in trials]


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    means = []
    for spec in argv:
        label, _, pathlist = spec.partition("=")
        trials, tests, lrs = per_trial_best(pathlist.split(","))
        n = len(tests)
        mean = sum(tests) / n
        std = (sum((x - mean) ** 2 for x in tests) / n) ** 0.5
        means.append((label, mean))
        print(f"{label}: mean {mean:.4f} +/- {std:.4f} (n={n}) | "
              + " ".join(f"t{t}:{x:.4f}@lr{lr:g}"
                         for t, x, lr in zip(trials, tests, lrs)))
    if len(means) == 2:
        (la, ma), (lb, mb) = means
        print(f"{la} vs {lb}: {100.0 * (ma - mb) / mb:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
