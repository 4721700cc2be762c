"""Offline RLDS dataset modification CLI (resize / re-encode / proprio
conversion), the reference `scripts/dataset/modify_rlds_dataset.py` role on
the native TFRecord path (no tensorflow_datasets).

Usage:
  python scripts/dataset/modify_rlds_dataset.py \
      --data-dir /data/raw --name bridge_dataset --target-dir /data/resize_224 \
      --mods resize_and_jpeg_encode --image-size 224 --workers 16 --shards 32
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from intact_tpu.data.preprocess import RLDS_MOD_FUNCTIONS, modify_rlds_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--target-dir", required=True)
    ap.add_argument("--mods", nargs="+", required=True,
                    choices=sorted(RLDS_MOD_FUNCTIONS))
    ap.add_argument("--split", default="train")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--image-encoding", choices=["jpeg", "png"], default="jpeg")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    out = modify_rlds_dataset(
        args.data_dir, args.name, args.target_dir, args.mods,
        split=args.split, num_workers=args.workers, num_shards=args.shards,
        image_size=args.image_size, image_encoding=args.image_encoding,
        limit=args.limit,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
