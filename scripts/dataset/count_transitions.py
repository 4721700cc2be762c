"""Data-pipeline smoke: iterate the train dataloader and count usable
transitions (the reference's `scripts/dataset/test_rlds_dataset.py` role).

Usage:
  python scripts/dataset/count_transitions.py --data-dir /data/resize_224 \
      --mix bridge [--batches 50] [--batch-size 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--mix", default="bridge")
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--window-size", type=int, default=1)
    ap.add_argument("--action-horizon", type=int, default=4)
    args = ap.parse_args()

    from intact_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
    from intact_tpu.data.rlds import make_interleaved_dataset

    kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
        args.mix, args.data_dir
    )
    for kw in kwargs_list:
        kw.pop("load_proprio", None)
    ds, total, stats = make_interleaved_dataset(
        kwargs_list, weights, train=True, shuffle_buffer_size=10_000,
        window_size=args.window_size, action_horizon=args.action_horizon,
        batch_size=args.batch_size,
    )
    print(f"# datasets: {[k['name'] for k in kwargs_list]}; "
          f"total transitions (stats): {total}", file=sys.stderr)

    n = 0
    t0 = time.time()
    for i, batch in enumerate(ds.as_numpy_iterator()):
        n += batch["action"].shape[0]
        if i + 1 >= args.batches:
            break
    dt = time.time() - t0
    print(json.dumps({
        "transitions_seen": n,
        "batches": args.batches,
        "transitions_per_sec": round(n / dt, 1),
        "total_transitions_in_mix": int(total),
    }))


if __name__ == "__main__":
    main()
