"""Delta-vs-base-task analysis over the gathered results CSV.

Each perturbed Simpler task variant (distractors, unseen combos, language
perturbations) maps to a base task (reference `gather_data_delta.py:7-31`
table); the report shows how much each perturbation costs relative to its
base, per metric.

Usage:
  python scripts/eval/gather_data_delta.py --csv scripts/eval/data_csv/results.csv
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path

# perturbed task -> base task it is measured against
DELTA_MAPPING = {
    "widowx_cube_on_plate_clean": "widowx_carrot_on_plate",
    "widowx_coke_can_on_plate_clean": "widowx_carrot_on_plate",
    "widowx_pepsi_on_plate_clean": "widowx_carrot_on_plate",
    "widowx_carrot_on_sponge_clean": "widowx_carrot_on_plate",
    "widowx_eggplant_on_sponge_clean": "widowx_put_eggplant_in_basket",
    "widowx_carrot_on_keyboard_clean": "widowx_carrot_on_plate",
    "widowx_small_plate_on_green_cube_clean": "widowx_cube_on_plate_clean",
    "widowx_coke_can_on_keyboard_clean": "widowx_coke_can_on_plate_clean",
    "widowx_spoon_on_towel_distract": "widowx_spoon_on_towel",
    "widowx_carrot_on_plate_distract": "widowx_carrot_on_plate",
    "widowx_carrot_on_keyboard_distract": "widowx_carrot_on_keyboard_clean",
    "widowx_coke_can_on_plate_distract": "widowx_coke_can_on_plate_clean",
    "widowx_coke_can_on_keyboard_distract": "widowx_coke_can_on_keyboard_clean",
    "widowx_carrot_on_plate_lang_common": "widowx_carrot_on_plate",
    "widowx_carrot_on_plate_lang_action": "widowx_carrot_on_plate",
    "widowx_carrot_on_plate_lang_neg": "widowx_carrot_on_plate",
    "widowx_carrot_on_plate_lang_neg_action": "widowx_carrot_on_plate_distract",
    "widowx_carrot_on_plate_lang_common_distract": "widowx_carrot_on_plate_lang_common",
    "widowx_spoon_on_towel_lang_action": "widowx_spoon_on_towel",
    "widowx_spoon_on_towel_lang_common": "widowx_spoon_on_towel",
    "widowx_spoon_on_towel_lang_common_distract": "widowx_spoon_on_towel_lang_common",
    "widowx_stack_cube_lang_action": "widowx_stack_cube",
}


def load_rows(csv_path: Path) -> list[dict]:
    with open(csv_path) as f:
        return list(csv.DictReader(f))


def compute_deltas(rows: list[dict], metric: str = "Success Rate") -> list[dict]:
    # mean over seeds per (name, step, ta, task)
    acc = defaultdict(list)
    for r in rows:
        if r["metric"] != metric:
            continue
        acc[(r["name"], r["step"], r["ta"], r["task"])].append(float(r["value"]))
    mean = {k: sum(v) / len(v) for k, v in acc.items()}

    out = []
    for (name, step, ta, task), value in sorted(mean.items()):
        base_task = DELTA_MAPPING.get(task)
        if base_task is None:
            continue
        base = mean.get((name, step, ta, base_task))
        if base is None:
            continue
        out.append({
            "name": name, "step": step, "ta": ta, "task": task,
            "base_task": base_task, "value": value, "base": base,
            "delta": value - base,
        })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--metric", default="Success Rate")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    deltas = compute_deltas(load_rows(Path(args.csv)), args.metric)
    for d in deltas:
        print(f"{d['name']} step={d['step']} {d['task']}: "
              f"{d['value']:.2%} vs {d['base']:.2%} (delta {d['delta']:+.2%})")
    if args.out:
        with open(args.out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(deltas[0]) if deltas else
                                    ["name", "step", "ta", "task", "base_task", "value", "base", "delta"])
            writer.writeheader()
            writer.writerows(deltas)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
