"""Trajectory-level transforms: chunking with pad masks, gripper relabeling.

Numpy reimplementation of the reference semantics
(`src/data/traj_transforms.py:13-103` chunk_act_obs,
`src/data/utils/data_utils.py:303-402` gripper helpers). Used by the
synthetic backend directly; the tf.data backend mirrors the same math in TF
ops (data/rlds.py).
"""

from __future__ import annotations

import numpy as np


def chunk_act_obs(traj: dict, window_size: int = 1, action_horizon: int = 1,
                  max_action_future: int | None = None) -> dict:
    """Chunk a trajectory dict into per-timestep observation histories and
    action-future chunks.

    In:  observation/* [T, ...], action [T, dim], optional action_pad_mask
         [T, dim], optional task/timestep goal index.
    Out: observation/* [T, window, ...] (+ timestep_pad_mask), action
         [T, window, horizon, dim], action_pad_mask [T, window, horizon, dim],
         and — when max_action_future is set — future_action
         [T, window, max_action_future, dim] (the reference's
         chunk_act_obs_also_future, `src/data/traj_transforms.py:106-168`:
         a longer action lookahead than the training horizon, repeating the
         last action past the end of the trajectory).

    Edge handling matches the reference: history repeats the first frame;
    action futures repeat the last action; actions past the goal/final
    timestep are marked padding via task_completed.
    """
    action = np.asarray(traj["action"])
    traj_len = action.shape[0]

    hist_idx = np.arange(traj_len)[:, None] + np.arange(-window_size + 1, 1)
    timestep_pad_mask = hist_idx >= 0
    hist_idx = np.maximum(hist_idx, 0)

    obs = {k: np.asarray(v)[hist_idx] for k, v in traj["observation"].items()}
    obs["timestep_pad_mask"] = timestep_pad_mask

    future_action = None
    if max_action_future is not None:
        if action.ndim == 2:
            fut_idx = np.arange(traj_len)[:, None] + np.arange(max_action_future)
            fut_idx = np.minimum(fut_idx, traj_len - 1)
            future_action = action[fut_idx]  # [T, F, dim]
        else:
            future_action = action[:, :max_action_future]
        future_action = future_action[hist_idx]  # [T, window, F, dim]

    if action.ndim == 2:
        chunk_idx = np.arange(traj_len)[:, None] + np.arange(action_horizon)
        chunk_idx = np.minimum(chunk_idx, traj_len - 1)
        action = action[chunk_idx]  # [T, horizon, dim]
    else:
        if action.shape[1] < action_horizon:
            raise ValueError(
                f"action_horizon ({action_horizon}) > pre-chunked dim ({action.shape[1]})"
            )
        action = action[:, :action_horizon]
    action = action[hist_idx]  # [T, window, horizon, dim]

    task = traj.get("task", {})
    goal_timestep = np.asarray(task.get("timestep", np.full(traj_len, traj_len - 1)))

    t, w, h = np.meshgrid(
        np.arange(traj_len), np.arange(window_size), np.arange(action_horizon),
        indexing="ij",
    )
    relative_goal = goal_timestep[:, None, None] - (t - (window_size + 1) + w + h)
    task_completed = relative_goal <= 0
    obs["task_completed"] = task_completed

    pad = np.asarray(traj.get("action_pad_mask", np.ones(action.shape[-1:], bool)))
    if pad.ndim == 1:
        pad = np.broadcast_to(pad, (traj_len, pad.shape[0]))
    if pad.ndim == 2:
        pad = pad[:, None, None, :]
    else:
        pad = pad[:, None, :]
    action_pad_mask = np.logical_and(pad, ~task_completed[:, :, :, None])

    out = dict(traj)
    out["observation"] = obs
    out["action"] = action.astype(np.float32)
    out["action_pad_mask"] = action_pad_mask
    if future_action is not None:
        out["future_action"] = future_action.astype(np.float32)
    return out


def subsample(traj: dict, length: int, rng: np.random.Generator) -> dict:
    """Random subsample to `length` frames (post-chunking)."""
    traj_len = len(traj["action"])
    if traj_len <= length:
        return traj
    idx = rng.choice(traj_len, size=length, replace=False)

    def take(v):
        return v[idx] if isinstance(v, np.ndarray) and v.shape[:1] == (traj_len,) else v

    out = {k: take(np.asarray(v)) if not isinstance(v, dict) else
           {kk: take(np.asarray(vv)) for kk, vv in v.items()} for k, v in traj.items()}
    return out


# ---------------------------------------------------------------------------
# gripper relabeling (bridge/fractal conventions)
# ---------------------------------------------------------------------------

def binarize_gripper_actions(actions: np.ndarray, open_thresh=0.95, close_thresh=0.05) -> np.ndarray:
    """Continuous gripper [0,1] -> binary, resolving intermediate values by
    scanning BACKWARD to the next decisive command (reference
    data_utils.py:303-341 semantics)."""
    actions = np.asarray(actions, np.float32)
    out = np.empty_like(actions)
    # value carried backward from the future: start assuming open
    carried = 1.0
    for i in range(len(actions) - 1, -1, -1):
        a = actions[i]
        if a > open_thresh:
            carried = 1.0
        elif a < close_thresh:
            carried = 0.0
        out[i] = carried
    return out


def invert_gripper_actions(actions: np.ndarray) -> np.ndarray:
    return 1.0 - np.asarray(actions, np.float32)


def rel2abs_gripper_actions(actions: np.ndarray) -> np.ndarray:
    """Relative (+1 open / -1 close / 0 hold) -> absolute [0, 1] positions:
    carry the last commanded state through holds; leading holds take the
    first future command (matching the reference's scan)."""
    actions = np.asarray(actions, np.float32)
    opening = actions > 0.5
    closing = actions < -0.5
    out = np.empty(len(actions), np.float32)
    state = 0.0  # unknown
    for i, (o, c) in enumerate(zip(opening, closing)):
        if o:
            state = 1.0
        elif c:
            state = -1.0
        out[i] = state
    # resolve leading unknowns with the first known state (default open)
    first_known = next((v for v in out if v != 0.0), 1.0)
    out[out == 0.0] = first_known
    return (out + 1.0) / 2.0  # -> [0, 1], 1 = open
