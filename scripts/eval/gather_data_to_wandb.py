"""Push gathered evaluation results to wandb (reference
`scripts/eval/gather_data_to_wandb.py` role). Reads the CSV produced by
gather_data_to_csv.py; one wandb run per experiment name, checkpoint step as
the x-axis.

  python scripts/eval/gather_data_to_wandb.py --csv results.csv --project INT-ACT
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path

from intact_tpu.utils.wandb_gate import init as wandb_init


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--project", default="INT-ACT")
    ap.add_argument("--entity", default=None)
    args = ap.parse_args()

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))

    by_name = defaultdict(lambda: defaultdict(dict))
    for r in rows:
        # mean over seeds happens wandb-side via multiple logs; key by step
        key = (int(r["step"]), r["task"], r["metric"], int(r["seed"]))
        by_name[r["name"]][int(r["step"])][f'{r["task"]}/{r["metric"]}/seed{r["seed"]}'] = float(r["value"])

    for name, steps in by_name.items():
        run = wandb_init(True, args.project, name=f"eval_{name}", entity=args.entity)
        for step in sorted(steps):
            run.log(steps[step], step=step)
        run.finish()
        print(f"logged {name}: {len(steps)} checkpoint steps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
