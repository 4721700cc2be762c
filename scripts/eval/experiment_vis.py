"""Visualize gathered eval results: success-rate-vs-checkpoint curves and
per-task bars (reference `scripts/eval/experiment_vis.py` role).

Usage:
  python scripts/eval/experiment_vis.py --csv scripts/eval/data_csv/results.csv \
      --metric "Success Rate" --out vis.png
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--metric", default="Success Rate")
    ap.add_argument("--out", default="experiment_vis.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.csv) as f:
        rows = [r for r in csv.DictReader(f) if r["metric"] == args.metric]

    # mean over seeds: (name, task, step) -> value
    acc = defaultdict(list)
    for r in rows:
        acc[(r["name"], r["task"], int(r["step"]))].append(float(r["value"]))
    mean = {k: sum(v) / len(v) for k, v in acc.items()}

    tasks = sorted({k[1] for k in mean})
    names = sorted({k[0] for k in mean})

    fig, axes = plt.subplots(1, 2, figsize=(14, 5))

    # 1) metric vs checkpoint step, one line per (name, task)
    for name in names:
        for task in tasks:
            pts = sorted((s, v) for (n, t, s), v in mean.items() if n == name and t == task)
            if len(pts) > 1:
                axes[0].plot([p[0] for p in pts], [p[1] for p in pts],
                             marker="o", label=f"{name}/{task}")
    axes[0].set_xlabel("gradient step")
    axes[0].set_ylabel(args.metric)
    axes[0].set_title(f"{args.metric} vs checkpoint")
    if axes[0].lines:
        axes[0].legend(fontsize=6)

    # 2) per-task bars at the final step
    final = defaultdict(dict)
    for (name, task, step), v in mean.items():
        if step >= max(s for (n, t, s) in mean if n == name and t == task):
            final[name][task] = v
    width = 0.8 / max(len(names), 1)
    for i, name in enumerate(names):
        xs = [j + i * width for j in range(len(tasks))]
        axes[1].bar(xs, [final[name].get(t, 0) for t in tasks], width, label=name)
    axes[1].set_xticks(range(len(tasks)))
    axes[1].set_xticklabels(tasks, rotation=45, ha="right", fontsize=7)
    axes[1].set_title(f"final-step {args.metric}")
    axes[1].legend(fontsize=7)

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
