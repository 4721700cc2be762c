"""tf.data-graph transforms: chunking, gripper relabel, image augmentation.

TF mirrors of the numpy math in data/transforms.py (the numpy versions are
the spec; tests assert parity). These run on host CPUs inside the input
pipeline — never on TPU.

Reference parity: traj chunking `src/data/traj_transforms.py:13-103`,
gripper scans `src/data/utils/data_utils.py:303-402`, seeded augmentation
`src/data/obs_transforms.py:15-106`.
"""

from __future__ import annotations

import tensorflow as tf


# ---------------------------------------------------------------------------
# gripper relabeling (tf scans)
# ---------------------------------------------------------------------------

def binarize_gripper_actions_tf(actions: tf.Tensor, open_thresh=0.95, close_thresh=0.05) -> tf.Tensor:
    """Continuous [0,1] -> binary, resolving intermediates by scanning
    backward to the next decisive command."""
    decisive_open = actions > open_thresh
    decisive_close = actions < close_thresh

    rev = tf.scan(
        lambda c, e: tf.where(e[0], 1.0, tf.where(e[1], 0.0, c)),
        (tf.reverse(decisive_open, [0]), tf.reverse(decisive_close, [0])),
        initializer=tf.constant(1.0),
    )
    return tf.reverse(rev, [0])


def invert_gripper_actions_tf(actions: tf.Tensor) -> tf.Tensor:
    return 1.0 - actions


def rel2abs_gripper_actions_tf(actions: tf.Tensor) -> tf.Tensor:
    """Relative (+1 open / -1 close / 0 hold) -> absolute [0,1] (1=open)."""
    opening = tf.cast(actions > 0.5, tf.float32)
    closing = tf.cast(actions < -0.5, tf.float32)
    command = opening - closing  # +1 / -1 / 0

    carried = tf.scan(
        lambda c, x: tf.where(x != 0.0, x, c), command, initializer=tf.constant(0.0)
    )
    # resolve leading holds with the first known state (default open)
    known = tf.boolean_mask(carried, carried != 0.0)
    first_known = tf.cond(
        tf.size(known) > 0, lambda: known[0], lambda: tf.constant(1.0)
    )
    carried = tf.where(carried == 0.0, first_known, carried)
    return (carried + 1.0) / 2.0


# ---------------------------------------------------------------------------
# trajectory chunking
# ---------------------------------------------------------------------------

def chunk_act_obs_tf(traj: dict, window_size: int = 1, action_horizon: int = 1,
                     max_action_future: int | None = None) -> dict:
    """tf mirror of data.transforms.chunk_act_obs (same shapes/semantics),
    including the future_action lookahead when max_action_future is set."""
    traj_len = tf.shape(traj["action"])[0]

    hist_idx = tf.range(traj_len)[:, None] + tf.range(-window_size + 1, 1)
    timestep_pad_mask = hist_idx >= 0
    hist_idx = tf.maximum(hist_idx, 0)

    obs = tf.nest.map_structure(lambda x: tf.gather(x, hist_idx), traj["observation"])
    obs["timestep_pad_mask"] = timestep_pad_mask

    future_action = None
    if max_action_future is not None:
        fa = traj["action"]
        if len(fa.shape) == 2:
            fut_idx = tf.range(traj_len)[:, None] + tf.range(max_action_future)
            fut_idx = tf.minimum(fut_idx, traj_len - 1)
            fa = tf.gather(fa, fut_idx)
        else:
            fa = fa[:, :max_action_future]
        future_action = tf.gather(fa, hist_idx)  # [T, window, F, dim]

    action = traj["action"]
    if len(action.shape) == 2:
        chunk_idx = tf.range(traj_len)[:, None] + tf.range(action_horizon)
        chunk_idx = tf.minimum(chunk_idx, traj_len - 1)
        action = tf.gather(action, chunk_idx)
    else:
        action = action[:, :action_horizon]
    action = tf.gather(action, hist_idx)  # [T, window, horizon, dim]

    task = traj.get("task", {})
    goal_timestep = task.get("timestep", tf.fill([traj_len], traj_len - 1))

    t, w, h = tf.meshgrid(
        tf.range(traj_len), tf.range(window_size), tf.range(action_horizon),
        indexing="ij",
    )
    relative_goal = goal_timestep[:, None, None] - (t - (window_size + 1) + w + h)
    task_completed = relative_goal <= 0
    obs["task_completed"] = task_completed

    if "action_pad_mask" in traj:
        pad = traj["action_pad_mask"]
        pad = pad[:, None, None, :] if len(pad.shape) == 2 else pad[:, None, :]
    else:
        pad = tf.ones(tf.concat([[traj_len], [1, 1], tf.shape(action)[-1:]], 0), tf.bool)
    action_pad_mask = tf.logical_and(pad, tf.logical_not(task_completed)[:, :, :, None])

    out = dict(traj)
    out["observation"] = obs
    out["action"] = tf.cast(action, tf.float32)
    out["action_pad_mask"] = action_pad_mask
    if future_action is not None:
        out["future_action"] = tf.cast(future_action, tf.float32)
    return out


# ---------------------------------------------------------------------------
# goal relabeling (pre-chunk, trajectory level)
# ---------------------------------------------------------------------------

def uniform_goal_relabel_tf(traj: dict, reached_proportion: float, seed) -> dict:
    """Uniform future-state goal relabeling (reference
    `src/data/dlimp/transforms/goal_relabeling.py:14-52`): with probability
    reached_proportion frame i gets goal = obs[i] (reward 0), else a goal
    sampled uniformly from obs[i+1:] (reward -1). The final frame is always
    goal-reaching. Adds task/goal_<image-key> and a per-frame reward.
    Stateless (seeded) version of the reference's stateful randoms."""
    traj_len = tf.shape(traj["action"])[0]
    seeds = tf.unstack(tf.random.experimental.stateless_split(seed, num=2), num=2)

    rand = tf.random.stateless_uniform([traj_len], seeds[0])
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(rand * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)

    reached = tf.random.stateless_uniform([traj_len], seeds[1]) < reached_proportion
    reached = tf.logical_or(reached, tf.range(traj_len) == traj_len - 1)
    goal_idxs = tf.where(reached, tf.range(traj_len), goal_idxs)

    task = dict(traj.get("task", {}))
    for key, value in traj["observation"].items():
        if key.startswith("image_"):
            task["goal_" + key] = tf.gather(value, goal_idxs)
    task["timestep"] = goal_idxs
    traj["task"] = task
    traj["reward"] = tf.where(reached, 0.0, -1.0)
    return traj


# ---------------------------------------------------------------------------
# frame-level image ops
# ---------------------------------------------------------------------------

def decode_and_resize_tf(image: tf.Tensor, size: tuple[int, int]) -> tf.Tensor:
    """Bytes or uint8 tensor -> uint8 [H, W, 3] resized (lanczos3, matching
    the reference's tf resize path). An empty byte string is a padding
    camera (reference obs_transforms.py:107-172) and decodes to zeros."""
    if image.dtype == tf.string:
        image = tf.cond(
            tf.strings.length(image) > 0,
            lambda: tf.ensure_shape(
                tf.io.decode_image(image, expand_animations=False, channels=3),
                [None, None, 3],
            ),
            lambda: tf.zeros((size[0], size[1], 3), tf.uint8),
        )
    if image.shape[-3:-1] != size:
        image = tf.cast(
            tf.clip_by_value(
                tf.image.resize(tf.cast(image, tf.float32), size, method="lanczos3"),
                0.0, 255.0,
            ),
            tf.uint8,
        )
    return image


def image_dropout_tf(image: tf.Tensor, seed: tf.Tensor, dropout_prob: float) -> tf.Tensor:
    """Zero out a whole camera frame with probability dropout_prob
    (reference obs_transforms.py:52-106 — robustness to missing cameras)."""
    drop = tf.random.stateless_uniform([], seed) < dropout_prob
    return tf.cond(drop, lambda: tf.zeros_like(image), lambda: image)


def padding_image_tf(size: tuple[int, int]) -> tf.Tensor:
    """Synthesized all-zero frame for missing cameras
    (reference obs_transforms.py:107-172)."""
    return tf.zeros((size[0], size[1], 3), tf.uint8)


def _crop_resize_jitter_tf(
    image_f32: tf.Tensor, out_size: tuple[int, int], seeds
) -> tf.Tensor:
    """Shared augment core: random-resized-crop (scale [0.8, 1.0]) fused
    into ONE bilinear crop_and_resize pass, then brightness/contrast/
    saturation/hue jitter with a single explicit HSV round trip (the
    tf.image.stateless_random_{saturation,hue} pair hides TWO rgb<->hsv
    conversions; fusing them halves the colorspace work). float32 [H,W,3]
    in [0,255] -> uint8 [out_h, out_w, 3]. seeds: 6 stateless seeds
    (scale, offset, brightness, contrast, saturation, hue)."""
    shape = tf.shape(image_f32)
    h = tf.cast(shape[-3], tf.float32)
    w = tf.cast(shape[-2], tf.float32)

    # crop box in normalized pixel-center coordinates
    scale = tf.random.stateless_uniform([], seeds[0], 0.8, 1.0)
    side = tf.sqrt(scale)
    ch = tf.floor(h * side)
    cw = tf.floor(w * side)
    off = tf.random.stateless_uniform([2], seeds[1], 0.0, 1.0)
    oy = tf.floor(off[0] * (h - ch + 1.0))
    ox = tf.floor(off[1] * (w - cw + 1.0))
    box = tf.stack([
        oy / (h - 1.0), ox / (w - 1.0),
        (oy + ch - 1.0) / (h - 1.0), (ox + cw - 1.0) / (w - 1.0),
    ])
    x = tf.image.crop_and_resize(
        image_f32[tf.newaxis], box[tf.newaxis], [0], out_size
    )[0] / 255.0

    # color jitter, one elementwise chain + one HSV round trip
    x = x + tf.random.stateless_uniform([], seeds[2], -0.1, 0.1)
    c = tf.random.stateless_uniform([], seeds[3], 0.9, 1.1)
    mean = tf.reduce_mean(x, axis=[-3, -2], keepdims=True)
    x = (x - mean) * c + mean
    sf = tf.random.stateless_uniform([], seeds[4], 0.9, 1.1)
    hd = tf.random.stateless_uniform([], seeds[5], -0.05, 0.05)
    hsv = tf.image.rgb_to_hsv(tf.clip_by_value(x, 0.0, 1.0))
    hue = tf.math.floormod(hsv[..., 0] + hd, 1.0)
    sat = tf.clip_by_value(hsv[..., 1] * sf, 0.0, 1.0)
    x = tf.image.hsv_to_rgb(tf.stack([hue, sat, hsv[..., 2]], axis=-1))
    return tf.cast(tf.clip_by_value(x, 0.0, 1.0) * 255.0, tf.uint8)


def augment_image_tf(image: tf.Tensor, seed: tf.Tensor) -> tf.Tensor:
    """Stateless (seeded) augmentation recipe the reference trains with
    (`agent/dataset.py:32-44`): random_resized_crop scale [0.8, 1.0] then
    brightness/contrast/saturation/hue jitter. uint8 in/out (same size)."""
    shape = tf.shape(image)
    seeds = tf.unstack(
        tf.random.experimental.stateless_split(seed, num=6), num=6
    )
    return _crop_resize_jitter_tf(
        tf.cast(image, tf.float32), (shape[-3], shape[-2]), seeds
    )


def decode_augment_resize_tf(
    image: tf.Tensor, size: tuple[int, int], seed: tf.Tensor
) -> tf.Tensor:
    """Fused train-path frame transform: decode, random-resized-crop on the
    SOURCE frame, ONE resize to `size`, color jitter.

    Replaces decode_and_resize_tf + augment_image_tf on the training path:
    that pair resizes twice (full-frame lanczos3 to `size`, then crop +
    bilinear back to `size`); cropping the raw frame and resizing once is
    both ~2x cheaper and closer to the reference's torchvision
    RandomResizedCrop, which crops the source image (`agent/dataset.py:
    32-44`). Padding cameras (empty byte string) stay all-zero — jitter
    would turn synthetic black frames gray."""
    if image.dtype == tf.string:
        is_padding = tf.strings.length(image) == 0
        image = tf.cond(
            is_padding,
            lambda: tf.zeros((1, 1, 3), tf.uint8),
            lambda: tf.ensure_shape(
                tf.io.decode_image(image, expand_animations=False, channels=3),
                [None, None, 3],
            ),
        )
    else:
        is_padding = tf.constant(False)
    seeds = tf.unstack(
        tf.random.experimental.stateless_split(seed, num=6), num=6
    )
    return tf.cond(
        is_padding,
        lambda: tf.zeros((size[0], size[1], 3), tf.uint8),
        lambda: _crop_resize_jitter_tf(tf.cast(image, tf.float32), size, seeds),
    )
