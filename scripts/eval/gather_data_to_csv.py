"""Collect evaluation summaries from eval.log trees into one CSV.

Walks the `eval_online/<sim>/<name>/step_N/ta_K/<seed>/<timestamp>/eval.log`
layout (the directory contract shared with the reference,
`base_evaluator.py:130-150`) and parses the `Evaluation Summary` blocks
emitted by `BaseEvaluator._log_summary`. Latest timestamp per
(name, step, ta, seed) wins.

Usage:
  python scripts/eval/gather_data_to_csv.py --log-root $VLA_LOG_DIR/eval_online \
      --out scripts/eval/data_csv/results.csv
"""

from __future__ import annotations

import argparse
import csv
import re
from pathlib import Path

SUMMARY_METRIC_RE = re.compile(r"-\s*([A-Za-z][A-Za-z @\.\d]*?):\s*([-\d\.]+)%?\s*$")
TASK_RE = re.compile(r"Task suite:\s*(.+)")
EXCLUDED = {"Number of episodes", "Total Task Eval Time"}


def parse_eval_log(log_path: Path) -> dict[str, dict[str, float]]:
    """-> {task: {metric: value in [0,1]}}."""
    out: dict[str, dict[str, float]] = {}
    task = None
    in_summary = False
    for line in log_path.read_text().splitlines():
        m = TASK_RE.search(line)
        if m:
            task = m.group(1).strip().split(" (")[0]
            out.setdefault(task, {})
            in_summary = False
            continue
        if "Evaluation Summary" in line:
            in_summary = True
            continue
        if in_summary and line.rstrip().endswith("===="):
            in_summary = False
            continue
        if in_summary and task:
            msg = line.rsplit(" - ", 1)[-1]  # strip logger prefix
            if ":" not in msg:
                continue
            name, val = msg.split(":", 1)
            name = name.strip()
            if name in EXCLUDED:
                continue
            try:
                v = float(val.strip().rstrip("%"))
            except ValueError:
                continue
            if val.strip().endswith("%"):
                v /= 100.0
            out[task][name] = v
    return out


def gather(log_root: Path) -> list[dict]:
    rows = []
    for sim_dir in sorted(p for p in log_root.iterdir() if p.is_dir()):
        for run in sorted(sim_dir.glob("*/step_*/ta_*/*")):
            # run = <name>/step_N/ta_K/<seed>
            stamps = sorted(d for d in run.iterdir() if d.is_dir())
            if not stamps:
                continue
            log = stamps[-1] / "eval.log"
            if not log.exists():
                continue
            seed = run.name
            ta = run.parent.name.removeprefix("ta_")
            step = run.parent.parent.name.removeprefix("step_")
            name = run.parent.parent.parent.name
            for task, metrics in parse_eval_log(log).items():
                for metric, value in metrics.items():
                    rows.append({
                        "simulator": sim_dir.name, "name": name, "step": int(step),
                        "ta": int(ta), "seed": int(seed), "task": task,
                        "metric": metric, "value": value,
                    })
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-root", required=True)
    ap.add_argument("--out", default="scripts/eval/data_csv/results.csv")
    args = ap.parse_args()

    rows = gather(Path(args.log_root))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["simulator", "name", "step", "ta", "seed", "task", "metric", "value"]
        )
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} rows to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
