"""Offline RLDS dataset modification (resize/encode/proprio conversion).

Role parity with the reference's preprocessing stack
(`scripts/dataset/modify_rlds_dataset.py`,
`src/data/oxe/preprocess/mod_functions.py`,
`multithreaded_adhoc_tfds_builder.py:258`): stream a TFDS-layout dataset
through a chain of episode-level mod functions on a thread pool and write a
new TFDS-layout dataset. Reading and writing use the native TFRecord path
(data/tfrecord_rlds.py) — no tensorflow_datasets needed.

Mod functions operate on decoded numpy episode trees and are registered in
RLDS_MOD_FUNCTIONS; new mods are one entry.
"""

from __future__ import annotations

import concurrent.futures
from pathlib import Path
from typing import Callable, Iterator

import numpy as np


def _is_image_key(key: str) -> bool:
    """Camera keys across OXE are wildly named (image_0, wrist_image,
    hand_image, cam_high, rgb_static, highres_image, finger_vision_1, ...);
    match by pattern plus every raw key the registry maps as a camera."""
    if "image" in key or "rgb" in key or key.startswith("cam_"):
        return True
    from intact_tpu.data.oxe.registry import OXE_DATASET_CONFIGS

    raw = {
        v for c in OXE_DATASET_CONFIGS.values()
        for v in c["image_keys"].values() if v
    }
    return key in raw


def _decode_images(ep: dict) -> dict:
    """Encoded per-step byte strings -> uint8 arrays (in place copies)."""
    import tensorflow as tf

    obs = dict(ep.get("observation", {}))
    for key, val in obs.items():
        arr = np.asarray(val)
        if _is_image_key(key) and arr.dtype.kind in ("S", "O"):
            obs[key] = np.stack(
                [tf.io.decode_image(f, channels=3).numpy() for f in arr]
            )
    out = dict(ep)
    out["observation"] = obs
    return out


def resize_images(ep: dict, size: int = 224) -> dict:
    """Resize every observation image to size x size (lanczos3, the
    reference's resize_and_jpeg_encode mod; jpeg encoding happens in the
    writer via image_encoding='jpeg')."""
    import tensorflow as tf

    obs = dict(ep["observation"])
    for key, val in obs.items():
        arr = np.asarray(val)
        if _is_image_key(key) and arr.dtype == np.uint8 and arr.ndim == 4:
            if arr.shape[1] != size or arr.shape[2] != size:
                obs[key] = tf.cast(
                    tf.clip_by_value(
                        tf.image.resize(
                            tf.cast(arr, tf.float32), (size, size), method="lanczos3"
                        ), 0.0, 255.0,
                    ), tf.uint8,
                ).numpy()
    out = dict(ep)
    out["observation"] = obs
    return out


def proprio_quat_to_euler(ep: dict) -> dict:
    """proprio [T, 8] (xyz + xyzw quat + gripper) -> [T, 7] (xyz + rpy +
    gripper) (reference ConvertProprioToEuler)."""
    from scipy.spatial.transform import Rotation

    obs = dict(ep["observation"])
    p = np.asarray(obs["proprio"], np.float32)
    if p.shape[-1] != 8:
        raise ValueError(f"expected 8-dim quat proprio, got {p.shape[-1]}")
    rpy = Rotation.from_quat(p[:, 3:7]).as_euler("xyz").astype(np.float32)
    obs["proprio"] = np.concatenate([p[:, :3], rpy, p[:, 7:8]], axis=-1)
    out = dict(ep)
    out["observation"] = obs
    return out


def proprio_euler_to_quat(ep: dict) -> dict:
    """proprio [T, 7] (xyz + rpy + gripper) -> [T, 8] (xyz + xyzw quat +
    gripper) (reference ConvertProprioToQuaternion)."""
    from scipy.spatial.transform import Rotation

    obs = dict(ep["observation"])
    p = np.asarray(obs["proprio"], np.float32)
    if p.shape[-1] != 7:
        raise ValueError(f"expected 7-dim euler proprio, got {p.shape[-1]}")
    quat = Rotation.from_euler("xyz", p[:, 3:6]).as_quat().astype(np.float32)
    obs["proprio"] = np.concatenate([p[:, :3], quat, p[:, 6:7]], axis=-1)
    out = dict(ep)
    out["observation"] = obs
    return out


RLDS_MOD_FUNCTIONS: dict[str, Callable[[dict], dict]] = {
    "resize_and_jpeg_encode": resize_images,  # pair with image_encoding="jpeg"
    "resize": resize_images,
    "proprio_quat_to_euler": proprio_quat_to_euler,
    "proprio_euler_to_quat": proprio_euler_to_quat,
}


def modify_rlds_dataset(
    data_dir: str | Path,
    name: str,
    target_dir: str | Path,
    mods: list[str],
    *,
    split: str = "train",
    num_workers: int = 8,
    num_shards: int = 8,
    image_size: int = 224,
    image_encoding: str = "jpeg",
    limit: int | None = None,
) -> Path:
    """Stream-modify a dataset: read -> decode -> mods (thread pool) ->
    write new TFDS-layout shards. Returns the written dataset dir."""
    from intact_tpu.data import tfrecord_rlds

    if Path(data_dir).resolve() == Path(target_dir).resolve():
        raise ValueError("target_dir must differ from data_dir (no overwrite)")
    for m in mods:
        if m not in RLDS_MOD_FUNCTIONS:
            raise KeyError(f"unknown mod {m!r}; available: {sorted(RLDS_MOD_FUNCTIONS)}")

    ds = tfrecord_rlds.read_rlds_dataset(
        data_dir, name, split=split, shuffle_files=False
    )

    def process(ep: dict) -> dict:
        ep = _decode_images(ep)
        for m in mods:
            fn = RLDS_MOD_FUNCTIONS[m]
            ep = fn(ep, image_size) if m in ("resize", "resize_and_jpeg_encode") else fn(ep)
        return ep

    def episode_stream() -> Iterator[dict]:
        # thread pool with a bounded in-flight window: decode/resize/encode
        # release the GIL inside tf ops, so threads overlap IO and compute
        # (the reference's MultiThreadedAdhocDatasetBuilder role)
        with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
            pending = []
            it = ds.as_numpy_iterator()
            for i, raw in enumerate(it):
                if limit is not None and i >= limit:
                    break
                pending.append(pool.submit(process, raw))
                if len(pending) >= num_workers * 2:
                    yield pending.pop(0).result()
            for f in pending:
                yield f.result()

    return tfrecord_rlds.write_rlds_dataset(
        target_dir, name, episode_stream(),
        split=split, num_shards=num_shards,
        image_encoding=image_encoding,
    )
