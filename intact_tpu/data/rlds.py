"""RLDS interleaved input pipeline on tf.data (host CPU).

Architecture parity with the reference pipeline (`src/data/rlds_dataset.py`:
make_dataset_from_rlds :264-489, apply_trajectory_transforms :34-182,
apply_frame_transforms :185-261, make_interleaved_dataset :492-615) without
porting dlimp — trajectory- vs frame-level stages are explicit function
boundaries here:

  load (tfds/episode-dir) -> standardize (oxe registry) -> statistics ->
  normalize -> traj transforms (filter, chunk, subsample) -> flatten ->
  weighted sample_from_datasets -> shuffle -> frame transforms (decode,
  resize, augment) -> batch -> numpy

TPU-specific fixes over the reference:
  * per-host sharding (`shard(num_shards, shard_index)` before interleave)
    — the reference ran an identical unsharded pipeline per DDP rank;
  * stateless (seeded) augmentation throughout, so every host/epoch is
    reproducible.

Episode sources: a TFDS builder dir when tensorflow_datasets is importable
(the OXE distribution format), else a directory of .npz episode files
(one file per trajectory with observation/*, action, language keys) —
written by scripts/dataset tooling — so the pipeline also runs in
environments without tfds.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np
import tensorflow as tf

from intact_tpu.data import stats as stats_lib
from intact_tpu.data.tf_transforms import (
    chunk_act_obs_tf,
    decode_and_resize_tf,
    decode_augment_resize_tf,
)

AUTOTUNE = tf.data.AUTOTUNE


# ---------------------------------------------------------------------------
# episode sources
# ---------------------------------------------------------------------------

def _episodes_from_tfds(name: str, data_dir: str, split: str, num_parallel_reads):
    """TFDS-format episodes via the native TFRecord reader
    (data/tfrecord_rlds.py — no tensorflow_datasets dependency). There is
    deliberately NO tensorflow_datasets fallback: an import-gated branch
    that never runs in CI is silent rot (VERDICT round-2 next #8). If a
    dataset's schema defeats the native parser, extend tfrecord_rlds (its
    feature parsing is dataset_info.json-driven) or convert the episodes
    with scripts/dataset/write_npz_episodes.py."""
    from intact_tpu.data import tfrecord_rlds

    try:
        return tfrecord_rlds.read_rlds_dataset(
            data_dir, name, split=split, num_parallel_reads=num_parallel_reads
        )
    except Exception as native_err:
        raise RuntimeError(
            f"native TFRecord reader failed for {name!r} under {data_dir!r} "
            f"(split {split!r}). Fix the dataset layout or extend "
            "intact_tpu/data/tfrecord_rlds.py for this schema; "
            "alternatively convert with scripts/dataset/write_npz_episodes.py "
            "and point data_dir at the .npz episode directory."
        ) from native_err


def _episodes_from_npz_dir(path: Path):
    """Directory of per-trajectory .npz files -> trajectory dict dataset."""
    files = sorted(str(p) for p in Path(path).glob("*.npz"))
    if not files:
        raise FileNotFoundError(f"no .npz episodes under {path}")

    def load(file_path):
        def _load_np(fp):
            with np.load(fp.numpy().decode(), allow_pickle=False) as z:
                img = z["image_primary"]
                return (
                    img,
                    z["proprio"].astype(np.float32),
                    z["action"].astype(np.float32),
                    z["language_instruction"].astype("S"),
                )

        img, proprio, action, lang = tf.py_function(
            _load_np, [file_path], [tf.uint8, tf.float32, tf.float32, tf.string]
        )
        img.set_shape([None, None, None, 3])
        proprio.set_shape([None, None])
        action.set_shape([None, None])
        lang.set_shape([None])
        return {
            "observation": {"image_primary": img, "proprio": proprio},
            "task": {"language_instruction": lang},
            "action": action,
        }

    return tf.data.Dataset.from_tensor_slices(files), load


# ---------------------------------------------------------------------------
# per-dataset pipeline
# ---------------------------------------------------------------------------

def make_dataset_from_rlds(
    name: str,
    data_dir: str,
    *,
    train: bool,
    standardize_fn=None,
    split: str | None = None,
    action_normalization_mask=None,
    normalization_type: str = "normal",
    dataset_statistics: dict | str | None = None,
    skip_unlabeled: bool = True,
    max_action: float | None = None,
    shard_index: int = 0,
    num_shards: int = 1,
    num_parallel_reads=AUTOTUNE,
    num_parallel_calls=AUTOTUNE,
):
    """-> (trajectory dataset, statistics dict). Trajectories are in the
    canonical layout after `standardize_fn`."""
    src = Path(data_dir) / name
    # TFDS on-disk layout is read natively (data/tfrecord_rlds.py) — no
    # tensorflow_datasets needed; presence of dataset_info.json decides.
    use_tfds = src.exists() and any(src.rglob("dataset_info.json"))

    if use_tfds:
        split = split or ("train[:95%]" if train else "train[95%:]")
        ds = _episodes_from_tfds(name, data_dir, split, num_parallel_reads)
        if num_shards > 1:
            ds = ds.shard(num_shards, shard_index)
        if standardize_fn is not None:
            ds = ds.map(standardize_fn, num_parallel_calls=num_parallel_calls)

        def stats_source():
            full = _episodes_from_tfds(name, data_dir, "train", num_parallel_reads)
            if standardize_fn is not None:
                return full.map(standardize_fn, num_parallel_calls=num_parallel_calls)
            return full
    else:
        files_ds, load = _episodes_from_npz_dir(src)
        n = int(files_ds.cardinality())
        split_point = int(n * 0.95)
        files_ds = files_ds.take(split_point) if train else files_ds.skip(split_point)
        if num_shards > 1:
            files_ds = files_ds.shard(num_shards, shard_index)
        ds = files_ds.map(load, num_parallel_calls=num_parallel_calls)
        # npz episodes are pre-standardized by the conversion tooling

        def stats_source():
            full_files, full_load = _episodes_from_npz_dir(src)
            return full_files.map(full_load, num_parallel_calls=num_parallel_calls)

    # statistics: explicit dict/path, else compute+cache from the data.
    # Computed over the FULL dataset — never the per-host shard or the
    # train/val slice — so every host and both splits normalize with
    # IDENTICAL constants (the reference computes over the builder's whole
    # train split the same way, rlds_dataset.py:411-438). Also computed
    # BEFORE the unlabeled/max-action filters so datasets whose language is
    # deliberately blank (kuka, toto, ... — see the OXE registry
    # has_language flags) still yield statistics.
    if isinstance(dataset_statistics, (str, Path)):
        statistics = stats_lib.load_statistics(dataset_statistics)
    elif isinstance(dataset_statistics, dict):
        statistics = dataset_statistics
    else:
        def traj_iter():
            for t in stats_source().as_numpy_iterator():
                yield {"action": t["action"], "proprio": t["observation"]["proprio"]}

        statistics = stats_lib.get_dataset_statistics(
            traj_iter, [name, str(data_dir), "full"]
        )

    if skip_unlabeled:
        ds = ds.filter(
            lambda t: tf.math.reduce_any(t["task"]["language_instruction"] != "")
        )
    if max_action is not None:
        ds = ds.filter(
            lambda t: tf.math.reduce_all(tf.abs(t["action"]) <= max_action)
        )

    # normalize in-graph
    mask = np.asarray(
        action_normalization_mask
        if action_normalization_mask is not None
        else [True] * len(statistics["action"]["mean"])
    )

    def normalize(traj):
        a = traj["action"]
        if normalization_type == "normal":
            mean = tf.constant(statistics["action"]["mean"], tf.float32)
            std = tf.constant(statistics["action"]["std"], tf.float32)
            na = (a - mean) / (std + 1e-8)
        else:
            lo = tf.constant(statistics["action"]["p01"], tf.float32)
            hi = tf.constant(statistics["action"]["p99"], tf.float32)
            na = tf.clip_by_value(2.0 * (a - lo) / (hi - lo + 1e-8) - 1.0, -1.0, 1.0)
        traj["action"] = tf.where(tf.constant(mask), na, a)
        if "proprio" in traj["observation"] and "proprio" in statistics:
            p = traj["observation"]["proprio"]
            if normalization_type == "normal":
                pm = tf.constant(statistics["proprio"]["mean"], tf.float32)
                ps = tf.constant(statistics["proprio"]["std"], tf.float32)
                traj["observation"]["proprio"] = (p - pm) / (ps + 1e-8)
            else:
                lo = tf.constant(statistics["proprio"]["p01"], tf.float32)
                hi = tf.constant(statistics["proprio"]["p99"], tf.float32)
                traj["observation"]["proprio"] = tf.clip_by_value(
                    2.0 * (p - lo) / (hi - lo + 1e-8) - 1.0, -1.0, 1.0
                )
        return traj

    ds = ds.map(normalize, num_parallel_calls=num_parallel_calls)
    return ds, statistics


def apply_trajectory_transforms(
    ds: tf.data.Dataset,
    *,
    train: bool,
    window_size: int = 1,
    action_horizon: int = 1,
    max_action_future: int | None = None,
    goal_relabeling_strategy: str | None = None,
    goal_relabeling_kwargs: dict | None = None,
    rephrase_table=None,  # tf StaticHashTable (Rephraser.to_tf_table())
    rephrase_prob: float = 0.5,
    subsample_length: int | None = None,
    seed: int = 0,
    num_parallel_calls=AUTOTUNE,
) -> tf.data.Dataset:
    """Order matches the reference (`rlds_dataset.py:34-182`): goal relabel
    -> task augment (paraphrase) -> chunk -> subsample. Randomness is
    stateless, keyed on (seed, trajectory index)."""
    from intact_tpu.data.tf_transforms import uniform_goal_relabel_tf

    if goal_relabeling_strategy is not None or rephrase_table is not None:
        if goal_relabeling_strategy not in (None, "uniform"):
            raise ValueError(
                f"unknown goal_relabeling_strategy {goal_relabeling_strategy!r}"
            )
        kwargs = goal_relabeling_kwargs or {"reached_proportion": 0.3}

        def traj_augment(i, traj):
            s = tf.stack([tf.cast(i, tf.int32), seed])
            s1, s2 = tf.unstack(
                tf.random.experimental.stateless_split(s, num=2), num=2
            )
            if goal_relabeling_strategy == "uniform":
                traj = uniform_goal_relabel_tf(traj, seed=s1, **kwargs)
            if rephrase_table is not None and train:
                from intact_tpu.data.task_augmentation import (
                    rephrase_instruction_traj_tf,
                )

                traj = rephrase_instruction_traj_tf(
                    traj, rephrase_table, rephrase_prob, s2
                )
            return traj

        ds = ds.enumerate().map(traj_augment, num_parallel_calls=num_parallel_calls)

    ds = ds.map(
        lambda t: chunk_act_obs_tf(t, window_size, action_horizon, max_action_future),
        num_parallel_calls=num_parallel_calls,
    )
    if train and subsample_length is not None:
        def subsample(i, traj):
            # stateless, keyed on (seed, trajectory index) like every other
            # random op in the pipeline — keeps the documented bitwise
            # reproducibility (a bare tf.random.shuffle draws from the
            # global stateful RNG and differs per run/host)
            length = tf.shape(traj["action"])[0]
            key = tf.stack([tf.cast(seed + 7919, tf.int32),
                            tf.cast(i % (1 << 31), tf.int32)])
            idx = tf.random.experimental.stateless_shuffle(
                tf.range(length), seed=key
            )[:subsample_length]
            return tf.nest.map_structure(lambda x: tf.gather(x, idx), traj)

        ds = ds.enumerate().map(subsample, num_parallel_calls=num_parallel_calls)
    return ds


def flatten_to_frames(ds: tf.data.Dataset) -> tf.data.Dataset:
    return ds.flat_map(tf.data.Dataset.from_tensor_slices)


def apply_frame_transforms(
    ds: tf.data.Dataset,
    *,
    train: bool,
    resize_size: tuple[int, int] = (224, 224),
    augment: bool = True,
    augment_seed: int = 0,
    image_dropout_prob: float = 0.0,
    num_parallel_calls=AUTOTUNE,
) -> tf.data.Dataset:
    """Decode/resize every image_* camera key, then (train) seeded augment
    and whole-frame image dropout (reference obs_transforms.py:15-106;
    dropout keeps image_primary as the always-kept camera)."""
    from intact_tpu.data.tf_transforms import image_dropout_tf

    def frame_fn(frame, seed_offset):
        obs = frame["observation"]
        image_keys = sorted(k for k in obs if k.startswith("image_"))
        for j, key in enumerate(image_keys):
            img = obs[key]  # [window, H, W, C]
            if train and augment:
                # fused decode+crop+resize+jitter: ONE resize over the
                # source-frame crop instead of full-frame lanczos3 + a
                # second crop/resize (see decode_augment_resize_tf)
                seed = tf.stack(
                    [tf.cast(seed_offset, tf.int32) * 31 + j, augment_seed]
                )
                img = tf.map_fn(
                    lambda im: decode_augment_resize_tf(im, resize_size, seed),
                    img, fn_output_signature=tf.uint8,
                )
            else:
                img = tf.map_fn(
                    lambda im: decode_and_resize_tf(im, resize_size), img,
                    fn_output_signature=tf.uint8,
                )
            if train and image_dropout_prob > 0.0 and key != "image_primary":
                seed = tf.stack(
                    [tf.cast(seed_offset, tf.int32) * 37 + j, augment_seed + 1]
                )
                img = image_dropout_tf(img, seed, image_dropout_prob)
            obs[key] = img
        # goal images from goal relabeling (task/goal_image_*) get the same
        # decode/resize (no augment/dropout: goals are conditioning, and
        # the reference's frame transforms decode task images identically,
        # obs_transforms.py:107-172)
        task = frame.get("task")
        if isinstance(task, dict):
            for key in sorted(k for k in task if k.startswith("goal_image")):
                task[key] = decode_and_resize_tf(task[key], resize_size)
        return frame

    return ds.enumerate().map(
        lambda i, f: frame_fn(f, i), num_parallel_calls=num_parallel_calls
    )


# ---------------------------------------------------------------------------
# interleaved mix
# ---------------------------------------------------------------------------

def make_interleaved_dataset(
    dataset_kwargs_list: list[dict],
    sample_weights: list[float] | None,
    *,
    train: bool,
    shuffle_buffer_size: int,
    window_size: int = 1,
    action_horizon: int = 1,
    max_action_future: int | None = None,
    subsample_length: int | None = None,
    goal_relabeling_strategy: str | None = None,
    rephrase_table=None,
    rephrase_prob: float = 0.5,
    image_dropout_prob: float = 0.0,
    resize_size=(224, 224),
    balance_weights: bool = True,
    batch_size: int | None = None,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    normalization_type: str = "normal",
    dataset_statistics=None,
    split: str | None = None,
    skip_unlabeled: bool | None = None,
    num_parallel_calls=AUTOTUNE,
    num_parallel_reads=AUTOTUNE,
):
    """-> (tf.data.Dataset of frames/batches, total_transitions, stats dict).

    normalization_type applies to every dataset in the mix (the serving
    adapters must invert it with the same scheme). dataset_statistics (path
    or dict) is honored only for SINGLE-dataset mixes — per-dataset stats
    in a multi-dataset mix must come from the data. skip_unlabeled only
    tightens datasets the registry marked as language-labeled (forcing the
    filter onto a blank-language dataset would drop everything)."""
    sample_weights = list(sample_weights or [1.0] * len(dataset_kwargs_list))

    if dataset_statistics is not None and len(dataset_kwargs_list) > 1:
        import logging

        logging.getLogger("intact_tpu.rlds").warning(
            "explicit dataset_statistics ignored for a %d-dataset mix "
            "(per-dataset statistics are computed from the data)",
            len(dataset_kwargs_list),
        )
        dataset_statistics = None

    datasets, sizes, all_stats = [], [], {}
    for kwargs in dataset_kwargs_list:
        kw = dict(kwargs)
        load_proprio = kw.pop("load_proprio", True)
        kw.setdefault("normalization_type", normalization_type)
        kw.setdefault("num_parallel_calls", num_parallel_calls)
        kw.setdefault("num_parallel_reads", num_parallel_reads)
        if split is not None:
            kw.setdefault("split", split)
        if skip_unlabeled is not None and kw.get("skip_unlabeled", True):
            kw["skip_unlabeled"] = skip_unlabeled
        if dataset_statistics is not None:
            kw.setdefault("dataset_statistics", dataset_statistics)
        ds, statistics = make_dataset_from_rlds(
            train=train, shard_index=shard_index, num_shards=num_shards, **kw
        )
        if not load_proprio:
            # honor the opt-out: drop proprio from the canonical layout so
            # models never see it (reference oxe/__init__.py gates the
            # proprio key the same way)
            def _drop_proprio(traj):
                obs = {k: v for k, v in traj["observation"].items() if k != "proprio"}
                return {**traj, "observation": obs}

            ds = ds.map(_drop_proprio, num_parallel_calls=AUTOTUNE)
        all_stats[kwargs["name"]] = statistics
        sizes.append(statistics["num_transitions"])
        # repeat BEFORE the trajectory transforms: their stateless seeds key
        # on the enumerate index, which keeps increasing across epochs here
        # — repeating after would re-enumerate from 0 every epoch and replay
        # identical goal relabels / paraphrases / subsample windows forever
        ds = apply_trajectory_transforms(
            ds.repeat(), train=train, window_size=window_size,
            action_horizon=action_horizon,
            max_action_future=max_action_future,
            subsample_length=subsample_length,
            goal_relabeling_strategy=goal_relabeling_strategy,
            rephrase_table=rephrase_table, rephrase_prob=rephrase_prob,
            seed=seed,
        )
        datasets.append(flatten_to_frames(ds))

    # heterogeneous mixes (e.g. oxe_flex_act_soup: 7-dof EEF + 14-dof
    # bimanual + 2-dof nav; per-robot proprio widths) must agree on element
    # specs before interleaving: pad action / future_action / proprio to the
    # mix maxima, with an explicit action_pad_mask so padded action dims
    # drop out of the loss (reference traj_transforms.pad_actions_and_proprio)
    def _last_dim(spec, *keys):
        node = spec
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return int(node.shape[-1])

    targets = {}
    for keys in [("action",), ("future_action",), ("observation", "proprio")]:
        dims = [_last_dim(d.element_spec, *keys) for d in datasets]
        present = [x for x in dims if x is not None]
        if present and any(x != max(present) for x in dims):
            targets[keys] = max(present)

    if targets:
        def pad_dataset(ds_):
            spec = ds_.element_spec

            def f(frame):
                frame = dict(frame)
                for keys, target in targets.items():
                    cur = _last_dim(spec, *keys)
                    if cur is None or cur == target:
                        continue
                    pad = target - cur
                    node = frame
                    for k in keys[:-1]:
                        node[k] = dict(node[k])
                        node = node[k]
                    a = node[keys[-1]]
                    widths = [[0, 0]] * (len(a.shape) - 1) + [[0, pad]]
                    node[keys[-1]] = tf.pad(a, widths)
                    if keys == ("action",):
                        m = frame.get("action_pad_mask")
                        if m is None:
                            m = tf.ones_like(a, tf.bool)
                        frame["action_pad_mask"] = tf.pad(
                            m, widths, constant_values=False
                        )
                return frame

            return ds_.map(f, num_parallel_calls=AUTOTUNE)

        datasets = [pad_dataset(d) for d in datasets]

    if balance_weights:
        sample_weights = [w * s for w, s in zip(sample_weights, sizes)]
    total = sum(sample_weights)
    sample_weights = [w / total for w in sample_weights]

    if len(datasets) == 1:
        ds = datasets[0]
    else:
        ds = tf.data.Dataset.sample_from_datasets(
            datasets, weights=sample_weights, seed=seed
        )
    if shuffle_buffer_size > 1:
        ds = ds.shuffle(shuffle_buffer_size, seed=seed)
    ds = apply_frame_transforms(
        ds, train=train, resize_size=resize_size, augment_seed=seed,
        image_dropout_prob=image_dropout_prob,
    )
    # corrupt frames are logged and skipped instead of killing the epoch
    # (reference rlds_dataset.py:608 dataset.ignore_errors)
    ds = ds.ignore_errors(log_warning=True)
    if batch_size is not None:
        ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.with_options(_options())
    return ds.prefetch(AUTOTUNE), int(sum(sizes)), all_stats


def _options() -> tf.data.Options:
    opts = tf.data.Options()
    opts.experimental_optimization.map_parallelization = True
    opts.threading.private_threadpool_size = 0  # use shared pool
    return opts


# ---------------------------------------------------------------------------
# backend facade for data.dataset.InterleavedDataset
# ---------------------------------------------------------------------------

class RLDSInterleavedBackend:
    def __init__(self, data_cfg, section, split: str, seed: int,
                 shard_index: int = 0, num_shards: int = 1,
                 image_size: int = 224, rephraser=None,
                 normalization_type: str = "normal"):
        from intact_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights

        kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
            section.dataset_mix, str(section.data_path),
            load_proprio=section.load_proprio,
        )
        train = split == "train"
        # tf.data service: the SERVICE shards elements across its workers
        # and consumers, so the in-graph per-host shard must be disabled
        # (both together would drop data quadratically)
        self._service_address = getattr(section, "service_address", None)
        self._split = split
        if self._service_address:
            shard_index, num_shards = 0, 1
            # statistics are computed by iterating the FULL dataset before
            # the pipeline is registered with the service — that host-side
            # pass happens on EVERY TPU host unless it hits the on-disk
            # cache (~/.cache/intact_tpu, content-hashed). Pod runs should
            # pre-seed that cache (run one host first, or copy the cache
            # dir) or pass explicit dataset_statistics paths; warn so the
            # cost is never silent (ADVICE round-2 #4).
            from intact_tpu.data import stats as stats_lib

            uncached = [
                kw["name"] for kw in kwargs_list
                if not stats_lib.statistics_cache_path(
                    [kw["name"], str(section.data_path), "full"]
                ).exists()
            ]
            if uncached:
                logging.getLogger("intact_tpu.rlds").warning(
                    "tf.data service mode: dataset statistics for %s are not "
                    "in the local cache; THIS host will iterate those "
                    "datasets in full to compute them (once, then cached). "
                    "On a pod, pre-seed ~/.cache/intact_tpu from one host "
                    "to avoid paying this on every host.", uncached,
                )
        self._ds, self.num_transitions, self.statistics = make_interleaved_dataset(
            kwargs_list, weights,
            train=train,
            shuffle_buffer_size=section.shuffle_buffer_size,
            window_size=section.window_size or 1,
            action_horizon=section.action_horizon or 1,
            max_action_future=getattr(section, "max_action_future", None),
            subsample_length=getattr(section, "subsample_length", None),
            image_dropout_prob=(
                getattr(section, "image_dropout_prob", 0.0) if train else 0.0
            ),
            rephrase_table=(rephraser.to_tf_table() if rephraser and train else None),
            rephrase_prob=rephraser.rephrase_prob if rephraser else 0.5,
            resize_size=(image_size, image_size),
            seed=seed,
            shard_index=shard_index,
            num_shards=num_shards,
            # in-graph normalization must use the scheme the serving
            # adapters invert (EnvConfig.action_normalization_type); the
            # explicit stats file guarantees identical constants end to end
            normalization_type=normalization_type,
            dataset_statistics=getattr(section, "dataset_statistics_path", None),
            # "train"/"val" are role markers (the 95/5 split is derived);
            # anything else (e.g. "train[:50%]") is an explicit tfds split
            split=(
                section.split
                if getattr(section, "split", None) not in (None, "train", "val")
                else None
            ),
            skip_unlabeled=getattr(section, "skip_unlabeled", None),
            num_parallel_calls=(
                getattr(section, "num_parallel_calls", None) or AUTOTUNE
            ),
            num_parallel_reads=(
                getattr(section, "traj_read_threads", None) or AUTOTUNE
            ),
        )

    def batches(self, batch_size: int):
        ds = self._ds.batch(batch_size, drop_remainder=True)
        if self._service_address:
            import tensorflow as tf

            # one shared job per split: every host registers the same
            # pipeline and consumes disjoint batches from it; workers run
            # the pipeline (incl. the shuffle buffer) off the TPU hosts
            ds = ds.apply(
                tf.data.experimental.service.distribute(
                    processing_mode=tf.data.experimental.service.ShardingPolicy.OFF,
                    service=self._service_address,
                    job_name=f"intact_tpu_{self._split}",
                )
            )
        for batch in ds.as_numpy_iterator():
            yield batch
