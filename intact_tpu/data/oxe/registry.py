"""OXE dataset registry: schema configs, standardization transforms, mixes.

Reference parity (`src/data/oxe/oxe_dataset_configs.py:42-`,
`oxe_dataset_mixes.py:204-215`, `oxe_standardization_transforms.py`,
`oxe/__init__.py:14-104`): each entry describes where images/proprio live in
the raw RLDS trajectory, how actions are encoded, and a per-dataset
`standardize` transform mapping the raw schema onto the canonical layout
  observation/image_primary, observation/proprio, task/language_instruction,
  action [T, 7] (xyz delta, rpy delta, gripper in [0,1] where 1=open).

Transforms are written against a small tf-op surface so they run inside the
tf.data graph; the math matches the numpy helpers in data/transforms.py.

Currently registered: the mixes INT-ACT actually trains on (bridge,
fractal) plus mix aliases; the registry is additive — new OXE datasets are
one dict entry + transform.
"""

from __future__ import annotations

from typing import Callable

# ActionEncoding semantics (reference data/utils/data_utils.py ActionEncoding)
EEF_POS = "eef_pos"  # xyz delta + rpy delta + gripper


def _bridge_standardize(traj):
    """BridgeV2 (`oxe_standardization_transforms.py` bridge entry): actions
    already (xyz, rpy, gripper-open[0/1]); proprio is eef state."""
    import tensorflow as tf

    out = {
        "observation": {
            "image_primary": traj["observation"]["image_0"],
            "proprio": tf.cast(traj["observation"]["state"], tf.float32),
        },
        "task": {"language_instruction": traj["language_instruction"]},
        "action": tf.cast(traj["action"], tf.float32),
    }
    return out


def _fractal_standardize(traj):
    """Fractal/RT-1 (google robot): world-vector + rotation-delta + relative
    gripper closedness -> canonical 7-dof with absolute open-gripper [0,1]."""
    import tensorflow as tf

    from intact_tpu.data.tf_transforms import rel2abs_gripper_actions_tf

    obs = traj["observation"]
    act = traj["action"]
    gripper = rel2abs_gripper_actions_tf(
        tf.squeeze(act["gripper_closedness_action"], axis=-1)
    )
    action = tf.concat(
        [
            act["world_vector"],
            act["rotation_delta"],
            gripper[:, None],
        ],
        axis=-1,
    )
    return {
        "observation": {
            "image_primary": obs["image"],
            "proprio": tf.cast(obs["base_pose_tool_reached"], tf.float32),
        },
        "task": {"language_instruction": traj["observation"]["natural_language_instruction"]
                 if "natural_language_instruction" in traj["observation"]
                 else traj["language_instruction"]},
        "action": tf.cast(action, tf.float32),
    }


OXE_DATASET_CONFIGS: dict[str, dict] = {
    "bridge_dataset": {
        "image_keys": {"primary": "image_0"},
        "proprio_key": "state",
        "action_encoding": EEF_POS,
        "standardize": _bridge_standardize,
        "action_normalization_mask": [True] * 6 + [False],  # skip gripper
    },
    "fractal20220817_data": {
        "image_keys": {"primary": "image"},
        "proprio_key": "base_pose_tool_reached",
        "action_encoding": EEF_POS,
        "standardize": _fractal_standardize,
        "action_normalization_mask": [True] * 6 + [False],
    },
}

OXE_NAMED_MIXES: dict[str, list[tuple[str, float]]] = {
    "bridge": [("bridge_dataset", 1.0)],
    "fractal": [("fractal20220817_data", 1.0)],
    "bridge_fractal": [("bridge_dataset", 1.0), ("fractal20220817_data", 1.0)],
}


def make_oxe_dataset_kwargs_and_weights(
    mix_name: str,
    data_dir: str,
    load_proprio: bool = True,
) -> tuple[list[dict], list[float]]:
    """Named mix -> (per-dataset kwargs for make_dataset_from_rlds, weights)
    (reference oxe/__init__.py:107)."""
    if mix_name not in OXE_NAMED_MIXES:
        raise KeyError(f"Unknown mix {mix_name!r}; available: {sorted(OXE_NAMED_MIXES)}")
    kwargs_list, weights = [], []
    for name, weight in OXE_NAMED_MIXES[mix_name]:
        cfg = OXE_DATASET_CONFIGS[name]
        kwargs_list.append(
            {
                "name": name,
                "data_dir": data_dir,
                "standardize_fn": cfg["standardize"],
                "load_proprio": load_proprio,
                "action_normalization_mask": cfg["action_normalization_mask"],
            }
        )
        weights.append(weight)
    return kwargs_list, weights


def register_dataset(name: str, config: dict) -> None:
    OXE_DATASET_CONFIGS[name] = config


def register_mix(name: str, entries: list[tuple[str, float]]) -> None:
    OXE_NAMED_MIXES[name] = entries
