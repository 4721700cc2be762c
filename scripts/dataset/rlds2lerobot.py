"""Export an RLDS/TFDS (or .npz) dataset to the LeRobot v2.0 on-disk layout.

Role parity with the reference's `scripts/dataset/rlds2lerobot.py`: make
OXE trajectories consumable by LeRobot-stack training code. The exporter
has no lerobot dependency — it writes the documented v2.0 directory
contract directly:

  <out>/meta/info.json           dataset card (features, totals, paths)
  <out>/meta/tasks.jsonl         task_index <-> instruction
  <out>/meta/episodes.jsonl      per-episode length + tasks
  <out>/meta/stats.json          per-feature mean/std/min/max
  <out>/data/chunk-XXX/episode_XXXXXX.parquet
      columns: observation.images.top (png bytes), observation.state,
      action, timestamp, frame_index, episode_index, index, task_index

Usage:
  python scripts/dataset/rlds2lerobot.py --data-dir /data/resize_224 \
      --name bridge_dataset --out /data/lerobot/bridge --fps 5 [--limit 100]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

CHUNK_SIZE = 1000  # episodes per data chunk dir (lerobot default)


def iter_rlds_episodes(data_dir: str, name: str, limit: int | None):
    """Yield {image [T,H,W,3] uint8, state [T,D], action [T,D], task str}."""
    import tensorflow as tf

    from intact_tpu.data import tfrecord_rlds

    ds = tfrecord_rlds.read_rlds_dataset(data_dir, name, split="train",
                                         shuffle_files=False)
    for i, traj in enumerate(ds.as_numpy_iterator()):
        if limit is not None and i >= limit:
            return
        obs = traj["observation"]
        img_key = next(k for k in obs if k.startswith("image"))
        frames = obs[img_key]
        if frames.dtype.kind in ("S", "O"):  # encoded bytes -> uint8
            frames = np.stack(
                [tf.io.decode_image(f, channels=3).numpy() for f in frames]
            )
        state_key = "state" if "state" in obs else "proprio"
        lang = traj.get("language_instruction")
        task = (lang[0].decode() if lang is not None and len(lang) else "")
        yield {
            "image": frames,
            "state": np.asarray(obs.get(state_key, np.zeros((len(frames), 1))), np.float32),
            "action": np.asarray(traj["action"], np.float32),
            "task": task,
        }


def iter_npz_episodes(data_dir: str, name: str, limit: int | None):
    files = sorted((Path(data_dir) / name).glob("*.npz"))
    for i, f in enumerate(files):
        if limit is not None and i >= limit:
            return
        with np.load(f, allow_pickle=False) as z:
            lang = z["language_instruction"]
            yield {
                "image": z["image_primary"],
                "state": z["proprio"].astype(np.float32),
                "action": z["action"].astype(np.float32),
                "task": lang[0].decode() if len(lang) else "",
            }


def export(episodes, out: Path, fps: float, image_key="observation.images.top"):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out)
    (out / "meta").mkdir(parents=True, exist_ok=True)

    tasks: dict[str, int] = {}
    episode_meta = []
    running_index = 0
    stats_acc: dict[str, list] = {"observation.state": [], "action": []}
    feat_shapes = {}

    for ep_idx, ep in enumerate(episodes):
        chunk = ep_idx // CHUNK_SIZE
        data_dir = out / "data" / f"chunk-{chunk:03d}"
        data_dir.mkdir(parents=True, exist_ok=True)
        n = len(ep["action"])
        task = ep["task"]
        task_idx = tasks.setdefault(task, len(tasks))

        import tensorflow as tf

        png = [tf.io.encode_png(f).numpy() for f in ep["image"]]
        table = pa.table({
            image_key: pa.array(png, pa.binary()),
            "observation.state": pa.array(list(ep["state"].astype(np.float32))),
            "action": pa.array(list(ep["action"].astype(np.float32))),
            "timestamp": pa.array(np.arange(n, dtype=np.float32) / fps),
            "frame_index": pa.array(np.arange(n, dtype=np.int64)),
            "episode_index": pa.array(np.full(n, ep_idx, np.int64)),
            "index": pa.array(np.arange(running_index, running_index + n, dtype=np.int64)),
            "task_index": pa.array(np.full(n, task_idx, np.int64)),
        })
        pq.write_table(table, data_dir / f"episode_{ep_idx:06d}.parquet")

        running_index += n
        episode_meta.append({"episode_index": ep_idx, "tasks": [task], "length": n})
        stats_acc["observation.state"].append(ep["state"])
        stats_acc["action"].append(ep["action"])
        feat_shapes = {
            image_key: list(ep["image"].shape[1:]),
            "observation.state": [int(ep["state"].shape[-1])],
            "action": [int(ep["action"].shape[-1])],
        }

    if not episode_meta:
        raise ValueError("no episodes to export")

    with open(out / "meta" / "tasks.jsonl", "w") as f:
        for task, idx in sorted(tasks.items(), key=lambda kv: kv[1]):
            f.write(json.dumps({"task_index": idx, "task": task}) + "\n")
    with open(out / "meta" / "episodes.jsonl", "w") as f:
        for m in episode_meta:
            f.write(json.dumps(m) + "\n")

    stats = {}
    for key, arrs in stats_acc.items():
        cat = np.concatenate(arrs, axis=0)
        stats[key] = {
            "mean": cat.mean(0).tolist(), "std": cat.std(0).tolist(),
            "min": cat.min(0).tolist(), "max": cat.max(0).tolist(),
        }
    (out / "meta" / "stats.json").write_text(json.dumps(stats, indent=1))

    info = {
        "codebase_version": "v2.0",
        "robot_type": "widowx",
        "total_episodes": len(episode_meta),
        "total_frames": running_index,
        "total_tasks": len(tasks),
        "total_chunks": (len(episode_meta) - 1) // CHUNK_SIZE + 1,
        "chunks_size": CHUNK_SIZE,
        "fps": fps,
        "data_path": "data/chunk-{episode_chunk:03d}/episode_{episode_index:06d}.parquet",
        "features": {
            image_key: {"dtype": "image", "shape": feat_shapes[image_key]},
            "observation.state": {"dtype": "float32",
                                  "shape": feat_shapes["observation.state"]},
            "action": {"dtype": "float32", "shape": feat_shapes["action"]},
            "timestamp": {"dtype": "float32", "shape": [1]},
            "frame_index": {"dtype": "int64", "shape": [1]},
            "episode_index": {"dtype": "int64", "shape": [1]},
            "index": {"dtype": "int64", "shape": [1]},
            "task_index": {"dtype": "int64", "shape": [1]},
        },
    }
    (out / "meta" / "info.json").write_text(json.dumps(info, indent=1))
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fps", type=float, default=5.0)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--source", choices=["rlds", "npz"], default="rlds")
    args = ap.parse_args()

    it = (iter_rlds_episodes if args.source == "rlds" else iter_npz_episodes)(
        args.data_dir, args.name, args.limit
    )
    info = export(it, Path(args.out), args.fps)
    print(json.dumps({k: info[k] for k in
                      ("total_episodes", "total_frames", "total_tasks")}))


if __name__ == "__main__":
    main()
