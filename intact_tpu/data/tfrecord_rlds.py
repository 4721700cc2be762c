"""Direct TFRecord reader for TFDS/RLDS datasets — no tensorflow_datasets
dependency.

The OXE distribution format is plain TFRecord shards plus TFDS metadata:

  <data_dir>/<name>/<version>/
      dataset_info.json        (splits, shard lengths)
      features.json            (nested feature spec)
      <name>-<split>.tfrecord-00000-of-000NN

Each RLDS episode is ONE tf.train.Example whose step fields are flattened
with '/' separators and concatenated over time:
  steps/observation/image_0   bytes  (one encoded frame per step)
  steps/observation/state     floats (T * dim values)
  steps/action                floats (T * dim values)
  steps/language_instruction  bytes  (one per step)

This module parses features.json into a VarLen parse spec and reshapes the
flat values back to [T, ...] trajectories, replacing the reference's
`tfds.builder(...).as_dataset(...)` path (`src/data/rlds_dataset.py:409`)
with a dependency-free reader that the TPU-VM host can run as-is. The
tensorflow_datasets package, when present, is only a fallback for exotic
schemas (see data/rlds.py).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import tensorflow as tf

_DTYPES = {
    # tf.io.parse_single_example only supports float32/int64/string wire
    # types: uint8 Tensor leaves travel as int64 lists and are cast back
    # after parsing (see _CAST_BACK)
    "uint8": tf.int64,
    "int32": tf.int64,  # int features are serialized as int64 lists
    "int64": tf.int64,
    "float32": tf.float32,
    "float64": tf.float32,
    "string": tf.string,
    "bool": tf.int64,
}

# declared dtype -> post-parse cast (wire type in _DTYPES is coarser)
_CAST_BACK = {"uint8": tf.uint8}


def _dim(d) -> int:
    """One dimension entry -> int. TFDS writes proto3-JSON, so dims appear
    both as {"size": "256"} dicts and as plain "256" strings/ints."""
    if isinstance(d, dict):
        return int(d.get("size", -1))
    return int(d)


def _find_dataset_dir(data_dir: str | Path, name: str) -> Path:
    """<data_dir>/<name>[/<config>][/<version>] -> the dir holding
    dataset_info.json."""
    root = Path(data_dir) / name
    if (root / "dataset_info.json").exists():
        return root
    hits = sorted(root.rglob("dataset_info.json"))
    if not hits:
        raise FileNotFoundError(f"no dataset_info.json under {root}")
    return hits[0].parent


def _flatten_features(node: dict, prefix: str = "") -> dict[str, dict]:
    """TFDS features.json -> {flat_key: {dtype, shape, encoded}}.

    Handles FeaturesDict / Sequence / Tensor / Image / Text / Scalar nodes.
    Sequence introduces the time axis (dropped here — every leaf under
    `steps` is per-step and parsed as VarLen).
    """
    out: dict[str, dict] = {}

    def walk(n: dict, pfx: str):
        cls = n.get("pythonClassName", "")
        content = n.get("content", n)
        if cls.endswith("FeaturesDict") or "featuresDict" in n:
            feats = (
                n.get("featuresDict", {}).get("features")
                or content.get("features")
                or {}
            )
            for key, sub in feats.items():
                walk(sub, f"{pfx}/{key}" if pfx else key)
        elif cls.endswith("Sequence") or "sequence" in n:
            inner = n.get("sequence", {}).get("feature") or content.get("feature")
            walk(inner, pfx)
        elif cls.endswith("Image") or "image" in n:
            info = n.get("image", content)
            shape = [
                _dim(d) for d in info.get("shape", {}).get("dimensions", [])
            ] or [-1, -1, 3]
            out[pfx] = {"dtype": tf.string, "shape": shape, "encoded_image": True}
        elif cls.endswith("Text"):
            out[pfx] = {"dtype": tf.string, "shape": [], "encoded_image": False}
        elif cls.endswith("Scalar"):
            info = n.get("tensor", content)
            raw = info.get("dtype", "float32")
            out[pfx] = {
                "dtype": _DTYPES[raw], "shape": [], "encoded_image": False,
                "cast": _CAST_BACK.get(raw),
            }
        else:  # Tensor
            info = n.get("tensor", content)
            dims = info.get("shape", {}).get("dimensions", [])
            shape = [_dim(d) for d in dims]
            raw = info.get("dtype", "float32")
            out[pfx] = {
                "dtype": _DTYPES[raw], "shape": shape, "encoded_image": False,
                "cast": _CAST_BACK.get(raw),
            }

    walk(node, prefix)
    return out


def load_feature_spec(ds_dir: Path) -> dict[str, dict]:
    with open(ds_dir / "features.json") as f:
        return _flatten_features(json.load(f))


def load_split_info(ds_dir: Path) -> dict[str, int]:
    """split name -> number of episodes (from dataset_info.json)."""
    with open(ds_dir / "dataset_info.json") as f:
        info = json.load(f)
    out = {}
    for split in info.get("splits", []):
        lengths = [int(x) for x in split.get("shardLengths", [])]
        out[split["name"]] = sum(lengths)
    return out


def load_shard_lengths(ds_dir: Path, split: str) -> list[int]:
    """Per-shard episode counts for a split (dataset_info.json
    shardLengths), [] when absent."""
    with open(ds_dir / "dataset_info.json") as f:
        info = json.load(f)
    for s in info.get("splits", []):
        if s.get("name") == split:
            return [int(x) for x in s.get("shardLengths", [])]
    return []


def _resolve_split(split: str | None, available: dict[str, int]) -> tuple[str, float, float]:
    """'train[:95%]' -> ('train', 0.0, 0.95). ONLY %-slices are supported;
    absolute slices ('train[:1000]') raise instead of silently misparsing
    as percentages (which would overlap train/val partitions)."""
    split = split or "train"
    if "[" not in split:
        return split, 0.0, 1.0
    base, _, sl = split.partition("[")
    sl = sl.rstrip("]")
    lo, _, hi = sl.partition(":")
    for bound in (lo, hi):
        if bound and not bound.endswith("%"):
            raise ValueError(
                f"unsupported split slice {split!r}: only %-slices are "
                "implemented (e.g. 'train[:95%]'); absolute indices would "
                "misparse"
            )
    lo_f = float(lo.rstrip("%")) / 100.0 if lo else 0.0
    hi_f = float(hi.rstrip("%")) / 100.0 if hi else 1.0
    return base, lo_f, hi_f


def read_rlds_dataset(
    data_dir: str | Path,
    name: str,
    split: str | None = "train",
    shuffle_files: bool = True,
    seed: int = 0,
    num_parallel_reads=tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """-> dataset of nested trajectory dicts [T, ...] per episode.

    %-slice splits (train[:95%]) are applied per-episode via index sharding
    so train/val partitions are disjoint without tfds.
    """
    ds_dir = _find_dataset_dir(data_dir, name)
    spec = load_feature_spec(ds_dir)
    splits = load_split_info(ds_dir)
    base_split, lo, hi = _resolve_split(split, splits)

    files = sorted(str(p) for p in ds_dir.glob(f"*-{base_split}.tfrecord-*"))
    if not files:
        raise FileNotFoundError(f"no {base_split} tfrecord shards in {ds_dir}")
    sliced = lo > 0.0 or hi < 1.0
    shard_lengths = load_shard_lengths(ds_dir, base_split) if sliced else []
    total = splits.get(base_split, 0)
    lo_idx = int(round(lo * total))
    hi_idx = int(round(hi * total))

    if sliced and len(shard_lengths) == len(files) and sum(shard_lengths) == total:
        # per-shard skip/take from shardLengths: each shard knows exactly
        # which of its episodes fall inside the %-slice, so parallel reads
        # AND file shuffling stay legal (the fallback below reads every
        # record single-threaded through an enumerate/filter — the default
        # training split 'train[:95%]' would be input-bound on big data)
        starts = [0]
        for n in shard_lengths[:-1]:
            starts.append(starts[-1] + n)
        entries = []
        for f, s, n in zip(files, starts, shard_lengths):
            a = max(0, lo_idx - s)
            b = min(n, hi_idx - s)
            if b > a:
                entries.append((f, a, b - a))
        if shuffle_files:
            rng = np.random.default_rng(seed)
            rng.shuffle(entries)
        ds = tf.data.Dataset.from_tensor_slices((
            tf.constant([e[0] for e in entries], tf.string),
            tf.constant([e[1] for e in entries], tf.int64),
            tf.constant([e[2] for e in entries], tf.int64),
        )).interleave(
            lambda f, skip, take:
                tf.data.TFRecordDataset(f).skip(skip).take(take),
            cycle_length=num_parallel_reads,
            num_parallel_calls=tf.data.AUTOTUNE,
        )
    else:
        files_ds = tf.data.Dataset.from_tensor_slices(files)
        # without per-shard lengths, a %-sliced read keeps deterministic
        # file order + a single reader so the global enumerate below is
        # stable; full reads may shuffle and parallelize freely
        if shuffle_files and not sliced:
            files_ds = files_ds.shuffle(len(files), seed=seed)
        ds = tf.data.TFRecordDataset(
            files_ds,
            num_parallel_reads=1 if sliced else num_parallel_reads,
        )
        if sliced:
            def in_slice(i, _):
                return (i >= lo_idx) & (i < hi_idx)

            ds = ds.enumerate().filter(in_slice).map(lambda _, x: x)

    parse_spec = {
        key: tf.io.VarLenFeature(info["dtype"]) for key, info in spec.items()
    }

    def parse(record):
        ex = tf.io.parse_single_example(record, parse_spec)
        out: dict = {}
        for key, info in spec.items():
            val = tf.sparse.to_dense(ex[key])
            shape = info["shape"]
            if info["encoded_image"]:
                pass  # [T] encoded byte strings; decoded downstream
            elif info["dtype"] == tf.string:
                pass  # [T] strings
            elif shape and all(d > 0 for d in shape):
                val = tf.reshape(val, [-1] + list(shape))
            # scalars and unknown-shape tensors stay [T(*flat)]
            if info.get("cast") is not None:
                val = tf.cast(val, info["cast"])
            _assign_nested(out, key.split("/"), val)
        return _strip_steps(out)

    return ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)


def _assign_nested(tree: dict, keys: list[str], value) -> None:
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _strip_steps(tree: dict) -> dict:
    """TFDS RLDS nests everything under 'steps'; hoist it so trajectories
    look like {observation: ..., action: ..., language_instruction: ...} with
    episode-level metadata kept alongside."""
    if "steps" not in tree:
        return tree
    out = dict(tree["steps"])
    for k, v in tree.items():
        if k != "steps":
            out.setdefault(k, v)
    return out


# ---------------------------------------------------------------------------
# writer (tests + offline preprocessing tooling)
# ---------------------------------------------------------------------------

def write_rlds_dataset(
    out_dir: str | Path,
    name: str,
    episodes,
    *,
    split: str = "train",
    num_shards: int = 1,
    image_keys: tuple[str, ...] = ("image_0",),
    version: str = "1.0.0",
    image_encoding: str = "png",  # "png" | "jpeg"
) -> Path:
    """Write trajectories as TFDS-layout TFRecord shards + metadata.

    episodes: iterable of {observation: {...}, action: [T, d], ...} numpy
    trees (a list or a generator — generators stream, sharding round-robin).
    uint8 [T, H, W, 3] images are encoded per frame. Used by the tfds
    integration tests and the offline dataset tooling (the writer half of
    the reference's multithreaded adhoc TFDS builder,
    `src/data/oxe/preprocess/multithreaded_adhoc_tfds_builder.py`).
    """
    ds_dir = Path(out_dir) / name / version
    ds_dir.mkdir(parents=True, exist_ok=True)

    def flatten(tree, pfx=""):
        for k, v in tree.items():
            key = f"{pfx}/{k}" if pfx else k
            if isinstance(v, dict):
                yield from flatten(v, key)
            else:
                yield key, np.asarray(v)

    it = iter(episodes)
    first_episode = next(it)

    # features.json from the first episode
    features: dict = {"pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
                      "featuresDict": {"features": {}}}
    steps_features: dict = {}
    first = dict(flatten({"steps": first_episode}))
    from intact_tpu.data.preprocess import _is_image_key

    def _camera_key(k: str) -> bool:
        # explicit image_keys plus the registry-wide camera-name patterns
        # (rgb_static, cam_high, hand_image, ...) — a camera missed here
        # would serialize as int64 lists, a ~50x size blowup the reader
        # then cannot even parse
        return k in image_keys or _is_image_key(k)

    for key, arr in first.items():
        sub = key.split("/")[1:]  # strip leading "steps"
        leaf = "/".join(sub)
        is_img = _camera_key(sub[-1])
        if is_img and arr.dtype == np.uint8:
            node = {"pythonClassName": "tensorflow_datasets.core.features.image_feature.Image",
                    "image": {"shape": {"dimensions": [
                        {"size": int(s)} for s in arr.shape[1:]
                    ]}, "dtype": "uint8"}}
        elif arr.dtype.kind in ("S", "U", "O"):
            node = {"pythonClassName": "tensorflow_datasets.core.features.text_feature.Text"}
        else:
            node = {"pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
                    "tensor": {"shape": {"dimensions": [
                        {"size": int(s)} for s in arr.shape[1:]
                    ]}, "dtype": str(arr.dtype)}}
        steps_features[leaf] = node

    # nest the flat steps features back into FeaturesDicts
    def nest(flat: dict[str, dict]) -> dict:
        tree: dict = {}
        for key, node in flat.items():
            parts = key.split("/")
            cur = tree
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = ("LEAF", node)

        def to_feature(sub) -> dict:
            if isinstance(sub, tuple) and sub[0] == "LEAF":
                return sub[1]
            return {
                "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
                "featuresDict": {"features": {k: to_feature(v) for k, v in sub.items()}},
            }

        return to_feature(tree)

    features["featuresDict"]["features"]["steps"] = {
        "pythonClassName": "tensorflow_datasets.core.features.sequence_feature.Sequence",
        "sequence": {"feature": nest(steps_features)},
    }
    (ds_dir / "features.json").write_text(json.dumps(features, indent=1))

    # shards: streamed round-robin so generator inputs never materialize
    encode_img = tf.io.encode_png if image_encoding == "png" else (
        lambda fr: tf.io.encode_jpeg(fr, quality=95)
    )

    def serialize(ep) -> bytes:
        feats = {}
        for key, arr in flatten({"steps": ep}):
            sub = key.split("/")[1:]
            is_img = _camera_key(sub[-1])
            if is_img and arr.dtype == np.uint8 and arr.ndim >= 3:
                vals = [encode_img(frame).numpy() for frame in arr]
                feats[key] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=vals)
                )
            elif arr.dtype.kind in ("S", "U", "O"):
                vals = [s.encode() if isinstance(s, str) else bytes(s) for s in arr]
                feats[key] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=vals)
                )
            elif arr.dtype.kind in ("i", "u", "b"):
                feats[key] = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=arr.reshape(-1).astype(np.int64))
                )
            else:
                feats[key] = tf.train.Feature(
                    float_list=tf.train.FloatList(value=arr.reshape(-1).astype(np.float32))
                )
        return tf.train.Example(
            features=tf.train.Features(feature=feats)
        ).SerializeToString()

    writers = [
        tf.io.TFRecordWriter(str(
            ds_dir / f"{name}-{split}.tfrecord-{i:05d}-of-{num_shards:05d}"
        ))
        for i in range(num_shards)
    ]
    per_shard = [0] * num_shards
    try:
        import itertools

        for idx, ep in enumerate(itertools.chain([first_episode], it)):
            shard = idx % num_shards
            writers[shard].write(serialize(ep))
            per_shard[shard] += 1
    finally:
        for w in writers:
            w.close()

    (ds_dir / "dataset_info.json").write_text(json.dumps({
        "name": name,
        "version": version,
        "splits": [{"name": split,
                    "shardLengths": [str(c) for c in per_shard]}],
    }, indent=1))
    return ds_dir
