"""Write per-trajectory .npz episodes in the canonical layout.

Two sources:
  --source synthetic   deterministic generated bridge-like episodes (smoke
                       data for machines without OXE datasets)
  --source rlds        convert a TFDS/RLDS dataset (requires
                       tensorflow_datasets + the raw data) — the offline
                       modification role of the reference's
                       `scripts/dataset/modify_rlds_dataset.py` (resize,
                       standardize) fused with export.

Each file holds: image_primary uint8 [T, H, W, 3], proprio float32 [T, D],
action float32 [T, D], language_instruction bytes [T].

Usage:
  python scripts/dataset/write_npz_episodes.py --out /data/bridge_npz/bridge_dataset \
      --source synthetic --episodes 50 --image-size 224
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def write_synthetic(out: Path, episodes: int, image_size: int, seed: int) -> None:
    from intact_tpu.data.synthetic import SyntheticBridgeDataset

    # raw (unchunked) episodes: re-generate via the internal generator
    ds = SyntheticBridgeDataset(image_size=image_size, seed=seed)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(episodes):
        traj = ds.raw_episode(i)
        np.savez_compressed(
            out / f"episode_{i:06d}.npz",
            image_primary=traj["observation"]["image_primary"],
            proprio=traj["observation"]["proprio"],
            action=traj["action"],
            language_instruction=traj["task"]["language_instruction"],
        )
    print(f"wrote {episodes} episodes to {out}")


def write_from_rlds(out: Path, name: str, data_dir: str, image_size: int,
                    max_episodes: int | None) -> None:
    import tensorflow_datasets as tfds

    from intact_tpu.data.oxe import OXE_DATASET_CONFIGS
    from intact_tpu.data.tf_transforms import decode_and_resize_tf

    cfg = OXE_DATASET_CONFIGS[name]
    builder = tfds.builder(name, data_dir=data_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for episode in builder.as_dataset(split="train").as_numpy_iterator():
        traj = cfg["standardize"](episode["steps"])
        img = np.stack([
            decode_and_resize_tf(im, (image_size, image_size)).numpy()
            for im in traj["observation"]["image_primary"]
        ])
        np.savez_compressed(
            out / f"episode_{n:06d}.npz",
            image_primary=img,
            proprio=np.asarray(traj["observation"]["proprio"], np.float32),
            action=np.asarray(traj["action"], np.float32),
            language_instruction=np.asarray(
                traj["task"]["language_instruction"], dtype="S"
            ),
        )
        n += 1
        if max_episodes and n >= max_episodes:
            break
    print(f"wrote {n} episodes to {out}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--source", choices=["synthetic", "rlds"], default="synthetic")
    ap.add_argument("--name", default="bridge_dataset")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    if args.source == "synthetic":
        write_synthetic(out, args.episodes, args.image_size, args.seed)
    else:
        write_from_rlds(out, args.name, args.data_dir, args.image_size, args.episodes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
