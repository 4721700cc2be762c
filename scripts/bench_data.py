"""Input-pipeline throughput: the interleaved RLDS pipeline at the bridge
operating point (jpeg-encoded 256px source frames -> decode -> augment ->
resize 224 -> chunk(horizon 4) -> shuffle -> batch).

Purpose: show the tf.data host pipeline can out-feed the train step (91.2
samples/s/chip for the Pi0 expert-only fine-tune, 125.7 int8-tower) — i.e.
training is device-bound, not input-bound — and give a number to compare
when tuning thread allocation on real TPU-VM hosts. The reference has no equivalent
measurement (its test_rlds_dataset.py only counts transitions).

Writes a synthetic TFDS-layout TFRecord dataset once (cached under
--workdir), then measures steady-state batches/s through the FULL
make_interleaved_dataset graph (same stages the trainer consumes).

Prints ONE JSON line like bench.py.

Usage:
  python scripts/bench_data.py                    # 224px real shapes
  python scripts/bench_data.py --tiny --seconds 5 # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the train-side comparison point (README: Pi0 expert-only fine-tune, bf16
# fast path; the int8-frozen-tower point consumes 125.7)
TRAIN_SAMPLES_PER_SEC_PER_CHIP = 91.2


def ensure_dataset(workdir: Path, hw: int, n_traj: int, steps: int) -> Path:
    from intact_tpu.data import tfrecord_rlds

    root = workdir / f"bench_data_{hw}px_{n_traj}x{steps}"
    marker = root / "bridge_dataset" / "1.0.0" / "dataset_info.json"
    if marker.exists():
        return root
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    def episodes():
        for _ in range(n_traj):
            yield {
                "observation": {
                    "image_0": rng.integers(0, 256, (steps, hw, hw, 3),
                                            dtype=np.uint8),
                    "state": rng.normal(size=(steps, 7)).astype(np.float32),
                },
                "action": (rng.normal(size=(steps, 7)) * 0.05 + 0.5
                           ).astype(np.float32),
                "language_instruction": np.array(
                    ["put the carrot on the plate"] * steps
                ),
            }

    tfrecord_rlds.write_rlds_dataset(
        root, "bridge_dataset", episodes(), num_shards=4,
        image_encoding="jpeg",
    )
    return root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--workdir", default="/tmp/intact_tpu_bench_data")
    ap.add_argument("--traj", type=int, default=None)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    hw = 64 if args.tiny else 256          # source resolution (pre-resize)
    resize = 32 if args.tiny else 224      # model input resolution
    n_traj = args.traj or (8 if args.tiny else 64)

    from intact_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
    from intact_tpu.data.rlds import make_interleaved_dataset

    t0 = time.time()
    root = ensure_dataset(Path(args.workdir), hw, n_traj, args.steps)
    print(f"# dataset ready in {time.time()-t0:.1f}s ({root})", file=sys.stderr)

    # the REAL bridge path: oxe kwargs incl. the standardize transform
    # (gripper relabel/binarize, key remap) — what a production run executes
    kwargs, weights = make_oxe_dataset_kwargs_and_weights("bridge", str(root))
    for kw in kwargs:
        kw.pop("load_proprio", None)
    t0 = time.time()
    ds, n_transitions, _ = make_interleaved_dataset(
        kwargs, weights, train=True,
        shuffle_buffer_size=2000 if args.tiny else 10_000,
        window_size=1, action_horizon=4,
        image_dropout_prob=0.0,
        resize_size=(resize, resize), seed=0,
        batch_size=args.batch,
    )
    it = ds.as_numpy_iterator()
    first = next(it)
    img = first["observation"]["image_primary"]
    assert img.shape[0] == args.batch and img.shape[-3] == resize, img.shape
    print(f"# pipeline built + first batch in {time.time()-t0:.1f}s "
          f"({n_transitions} transitions on disk)", file=sys.stderr)

    # steady state: count batches for --seconds of wall clock
    n = 0
    t_start = time.time()
    while time.time() - t_start < args.seconds:
        next(it)
        n += 1
    wall = time.time() - t_start
    samples_per_sec = n * args.batch / wall
    print(f"# {n} batches of {args.batch} in {wall:.1f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "rlds_pipeline_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        # >1 means the host pipeline out-feeds one chip's train step
        "vs_baseline": (
            round(samples_per_sec / TRAIN_SAMPLES_PER_SEC_PER_CHIP, 2)
            if not args.tiny else None
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
