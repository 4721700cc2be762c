"""OXE dataset registry: schema configs, standardization transforms, mixes.

Reference parity (`src/data/oxe/oxe_dataset_configs.py`,
`oxe_dataset_mixes.py`, `oxe_standardization_transforms.py` — 63 datasets,
11 named mixes) with a different shape: instead of mutate-in-place
transforms plus a separate restructure stage, every per-dataset transform
here returns `(traj, action, proprio, language)` and one generic
`_canonicalize` step assembles the canonical layout

  observation/image_primary [image_secondary, image_wrist],
  observation/proprio, task/language_instruction,
  action [T, d] float32 (EEF: xyz delta, rpy delta, gripper in [0,1], 1=open)

directly inside the tf.data graph. Missing cameras become empty-string
padding frames (decoded to zeros downstream); datasets without proprio get
a zeros placeholder. Quaternion/euler conversions are implemented in plain
tf ops (the reference leans on tensorflow_graphics, absent here).
"""

from __future__ import annotations

import functools

import numpy as np

# ---------------------------------------------------------------------------
# encodings -> normalization masks (reference oxe/__init__.py:40-63)
# ---------------------------------------------------------------------------

EEF_POS = "eef_pos"  # xyz delta + rpy delta + gripper
JOINT_POS = "joint_pos"  # 7 joint deltas + gripper
JOINT_POS_BIMANUAL = "joint_pos_bimanual"  # 2 x (6 joints + gripper)
NAV_2D = "nav_2d"  # xy waypoint deltas
JOINT_POS_BIMANUAL_NAV = "joint_pos_bimanual_nav"  # bimanual + base vel

ACTION_NORMALIZATION_MASKS: dict[str, list[bool]] = {
    EEF_POS: [True] * 6 + [False],
    JOINT_POS: [True] * 7 + [False],
    JOINT_POS_BIMANUAL: [True] * 6 + [False] + [True] * 6 + [False],
    NAV_2D: [True] * 2,
    JOINT_POS_BIMANUAL_NAV: [True] * 6 + [False] + [True] * 6 + [False] + [True] * 2,
}


# ---------------------------------------------------------------------------
# tf helpers (geometry + gripper + traj surgery)
# ---------------------------------------------------------------------------

def _tf():
    import tensorflow as tf

    return tf


def quat_xyzw_to_euler(q):
    """[T, 4] xyzw quaternion -> [T, 3] roll/pitch/yaw (XYZ convention,
    matching tensorflow_graphics euler.from_quaternion)."""
    tf = _tf()
    x, y, z, w = tf.unstack(tf.cast(q, tf.float32), axis=-1)
    roll = tf.atan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = tf.asin(tf.clip_by_value(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = tf.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return tf.stack([roll, pitch, yaw], axis=-1)


def euler_to_axis_angle(rpy):
    """[T, 3] roll/pitch/yaw -> [T, 3] axis*angle (via quaternion, XYZ
    convention, matching tfg axis_angle.from_euler composed output)."""
    tf = _tf()
    r, p, y = tf.unstack(tf.cast(rpy, tf.float32) * 0.5, axis=-1)
    cr, sr = tf.cos(r), tf.sin(r)
    cp, sp = tf.cos(p), tf.sin(p)
    cy, sy = tf.cos(y), tf.sin(y)
    # q = qz(yaw) * qy(pitch) * qx(roll)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    yq = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    norm = tf.sqrt(tf.maximum(x * x + yq * yq + z * z, 1e-12))
    angle = 2.0 * tf.atan2(norm, w)
    axis = tf.stack([x, yq, z], axis=-1) / norm[:, None]
    return axis * angle[:, None]


def _relabel_eef_actions(traj):
    """Recompute xyz/rpy actions as reached-state deltas; drops the last
    step (reference data_utils.relabel_actions)."""
    tf = _tf()
    state = traj["observation"]["state"]
    movement = state[1:, :6] - state[:-1, :6]
    out = tf.nest.map_structure(lambda x: x[:-1], traj)
    out["action"] = tf.concat([movement, traj["action"][:-1, -1:]], axis=1)
    return out


def _every_nth(traj, n: int):
    tf = _tf()
    return tf.nest.map_structure(lambda x: x[::n], traj)


def _rel2abs(g):
    """Relative gripper CLOSEDNESS command -> absolute [0,1] (1 = open).

    The RT-1 family's raw `gripper_closedness_action` uses +1 = closing
    (reference data_utils.py:303 "+1 for closing, -1 for opening ->
    0 closed, 1 open"); our rel2abs helper's contract is +1 = OPEN, so the
    command is negated on the way in — without it every grasp would be
    labeled as an open."""
    from intact_tpu.data.tf_transforms import rel2abs_gripper_actions_tf

    return rel2abs_gripper_actions_tf(-g)


def _binarize(g):
    from intact_tpu.data.tf_transforms import binarize_gripper_actions_tf

    return binarize_gripper_actions_tf(g)


def _invert(g):
    from intact_tpu.data.tf_transforms import invert_gripper_actions_tf

    return invert_gripper_actions_tf(g)


def _clip01(g):
    return _tf().clip_by_value(g, 0.0, 1.0)


def _nat_lang(traj):
    """observation/natural_language_instruction (RT-X family layout)."""
    return traj["observation"]["natural_language_instruction"]


BLANK = object()  # sentinel: dataset has no informative language


# ---------------------------------------------------------------------------
# per-dataset transforms: traj -> (traj, action, proprio|None, language|None)
# language None -> traj["language_instruction"]; BLANK -> ""
# ---------------------------------------------------------------------------

def _bridge(traj):
    tf = _tf()
    traj["action"] = tf.concat(
        [traj["action"][:, :6], _binarize(traj["action"][:, -1])[:, None]], axis=1
    )
    traj = _relabel_eef_actions(traj)
    return traj, traj["action"], traj["observation"]["state"], None


def _rt1(traj):
    tf = _tf()
    act = traj["action"]
    g = _rel2abs(act["gripper_closedness_action"][:, 0])
    action = tf.concat([act["world_vector"], act["rotation_delta"], g[:, None]], -1)
    proprio = tf.concat(
        [traj["observation"]["base_pose_tool_reached"],
         traj["observation"]["gripper_closed"]], -1
    )
    return traj, action, proprio, _nat_lang(traj)


def _kuka(traj):
    tf = _tf()
    act = traj["action"]
    g = _rel2abs(act["gripper_closedness_action"][:, 0])
    action = tf.concat([act["world_vector"], act["rotation_delta"], g[:, None]], -1)
    eef = tf.io.decode_raw(
        tf.io.decode_compressed(
            traj["observation"]["clip_function_input/base_pose_tool_reached"],
            compression_type="ZLIB",
        ),
        tf.float32,
    )
    grip = tf.io.decode_raw(
        tf.io.decode_compressed(
            traj["observation"]["gripper_closed"], compression_type="ZLIB"
        ),
        tf.float32,
    )
    proprio = tf.concat(
        [tf.reshape(eef, (-1, 7)), tf.reshape(grip, (-1, 1))], -1
    )
    return traj, action, proprio, BLANK


def _taco(traj):
    tf = _tf()
    act = traj["action"]["rel_actions_world"]
    action = tf.concat([act[:, :6], _clip01(act[:, -1:])], -1)
    robs = traj["observation"]["robot_obs"]
    proprio = tf.concat([robs[:, :6], robs[:, -1:]], -1)
    return traj, action, proprio, _nat_lang(traj)


def _taco_libero(traj):
    """taco_play in libero action/state form: ypr euler -> axis-angle,
    gripper flipped to +1=close/-1=open."""
    tf = _tf()
    act = traj["action"]["rel_actions_world"]
    rpy = tf.gather(act[:, 3:6], [2, 1, 0], axis=1)  # ypr -> rpy
    aa = euler_to_axis_angle(rpy)
    g = 1.0 - 2.0 * _clip01(act[:, -1:])
    action = tf.concat([act[:, :3], aa, g], -1)

    robs = traj["observation"]["robot_obs"]
    rpy_s = tf.gather(robs[:, 3:6], [2, 1, 0], axis=1)
    proprio = tf.concat(
        [robs[:, :3], euler_to_axis_angle(rpy_s), -robs[:, -1:]], -1
    )
    return traj, action, proprio, _nat_lang(traj)


def _libero(traj):
    tf = _tf()
    action = traj["action"][:, :7]
    state = traj["observation"]["state"]
    g2 = state[:, -2:]
    closed = tf.reduce_min(tf.abs(g2), axis=1) < 0.015
    g1 = tf.where(closed, 1.0, -1.0)[:, None]
    proprio = tf.concat([state[:, :6], g1], -1)
    return traj, action, proprio, None


def _jaco_play(traj):
    tf = _tf()
    act = traj["action"]
    g = _rel2abs(act["gripper_closedness_action"][:, 0])
    action = tf.concat(
        [act["world_vector"], tf.zeros_like(act["world_vector"]), g[:, None]], -1
    )
    return traj, action, traj["observation"]["end_effector_cartesian_pos"], _nat_lang(traj)


def _cable_routing(traj):
    tf = _tf()
    act = traj["action"]
    action = tf.concat(
        [act["world_vector"], act["rotation_delta"],
         tf.zeros_like(act["world_vector"][:, :1])], -1
    )
    return traj, action, traj["observation"]["robot_state"], BLANK


def _roboturk(traj):
    tf = _tf()
    act = traj["action"]
    g = _invert(_clip01(act["gripper_closedness_action"]))
    action = tf.concat([act["world_vector"], act["rotation_delta"], g], -1)
    return traj, action, None, BLANK


def _nyu_door(traj):
    tf = _tf()
    act = traj["action"]
    g = _rel2abs(act["gripper_closedness_action"][:, 0])
    action = tf.concat([act["world_vector"], act["rotation_delta"], g[:, None]], -1)
    return traj, action, None, BLANK


def _viola(traj):
    tf = _tf()
    act = traj["action"]
    g = _invert(_clip01(act["gripper_closedness_action"][:, None]))
    action = tf.concat([act["world_vector"], act["rotation_delta"], g], -1)
    proprio = tf.concat(
        [traj["observation"]["joint_states"], traj["observation"]["gripper_states"]], -1
    )
    return traj, action, proprio, BLANK


def _autolab_ur5(traj):
    tf = _tf()
    act = traj["action"]
    g = _rel2abs(act["gripper_closedness_action"])
    action = tf.concat([act["world_vector"], act["rotation_delta"], g[:, None]], -1)
    return traj, action, traj["observation"]["robot_state"][:, 6:14], _nat_lang(traj)


def _toto(traj):
    tf = _tf()
    act = traj["action"]
    action = tf.concat(
        [act["world_vector"], act["rotation_delta"],
         tf.cast(act["open_gripper"][:, None], tf.float32)], -1
    )
    return traj, action, traj["observation"]["state"], BLANK


def _language_table(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat(
        [a, tf.zeros_like(a), tf.zeros_like(a), tf.ones_like(a[:, :1])], -1
    )
    # instructions are padded unicode codepoints -> strings
    encoded = tf.strings.unicode_encode(
        traj["observation"]["instruction"], output_encoding="UTF-8"
    )
    lang = tf.strings.split(encoded, "\x00")[:, :1].to_tensor()[:, 0]
    return traj, action, traj["observation"]["effector_translation"], lang


def _pusht(traj):
    tf = _tf()
    act = traj["action"]
    action = tf.concat(
        [act["world_vector"], act["rotation_delta"],
         act["gripper_closedness_action"][:, None]], -1
    )
    return traj, action, traj["observation"]["robot_state"], _nat_lang(traj)


def _stanford_kuka_mm(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :3], tf.zeros_like(a[:, :3]), a[:, -1:]], -1)
    proprio = tf.concat(
        [traj["observation"]["ee_position"], traj["observation"]["ee_orientation"]], -1
    )
    return traj, action, proprio, None


def _nyu_rot(traj):
    return traj, traj["action"][..., :7], traj["observation"]["state"], None


def _stanford_hydra(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :6], _invert(a[:, -1:])], -1)
    s = traj["observation"]["state"]
    proprio = tf.concat([s[:, :3], s[:, 7:10], s[:, -3:-2]], -1)
    return traj, action, proprio, BLANK


def _invert_clip_gripper_tail(traj, proprio_fn, language=BLANK):
    """shared shape: action[:6] + inverted clipped gripper."""
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :6], _invert(_clip01(a[:, -1:]))], -1)
    return traj, action, proprio_fn(traj), language


def _austin_buds(traj):
    return _invert_clip_gripper_tail(
        traj, lambda t: t["observation"]["state"][:, :8]
    )


def _nyu_franka_play(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, -8:-2], _clip01(a[:, -2:-1])], -1)
    return traj, action, traj["observation"]["state"][:, -6:], BLANK


def _maniskill(traj):
    tf = _tf()
    proprio = tf.concat(
        [traj["observation"]["tcp_pose"], traj["observation"]["state"][:, 7:8]], -1
    )
    return traj, traj["action"], proprio, None


def _furniture_bench(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat(
        [a[:, :3], quat_xyzw_to_euler(a[:, 3:7]), _invert(_clip01(a[:, -1:]))], -1
    )
    s = traj["observation"]["state"]
    proprio = tf.concat([s[:, :7], s[:, -1:]], -1)
    return traj, action, proprio, None


def _cmu_franka_exploration(traj):
    return traj, traj["action"][..., :-1], None, None


def _ucsd_kitchen(traj):
    return traj, traj["action"][..., :-1], traj["observation"]["state"][:, :7], None


def _ucsd_pick_place(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :3], tf.zeros_like(a[:, :3]), a[:, -1:]], -1)
    return traj, action, traj["observation"]["state"], None


def _austin_sailor(traj):
    return _invert_clip_gripper_tail(traj, lambda t: t["observation"]["state"])


def _austin_sirius(traj):
    return _invert_clip_gripper_tail(traj, lambda t: t["observation"]["state"])


def _bc_z(traj):
    tf = _tf()
    act = traj["action"]
    action = tf.concat(
        [act["future/xyz_residual"][:, :3],
         act["future/axis_angle_residual"][:, :3],
         _invert(tf.cast(act["future/target_close"][:, :1], tf.float32))], -1
    )
    obs = traj["observation"]
    proprio = tf.concat(
        [obs["present/xyz"], obs["present/axis_angle"], obs["present/sensed_close"]], -1
    )
    return traj, action, proprio, _nat_lang(traj)


def _utokyo_pr2(traj):
    return traj, traj["action"][..., :-1], traj["observation"]["state"], None


def _utokyo_xarm_pick_place(traj):
    return traj, traj["action"], None, None


def _utokyo_xarm_bimanual(traj):
    return traj, traj["action"][..., -7:], traj["observation"]["end_effector_pose"], None


def _robo_net(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :4], tf.zeros_like(a[:, :2]), a[:, -1:]], -1)
    s = traj["observation"]["state"]
    proprio = tf.concat([s[:, :4], tf.zeros_like(s[:, :2]), s[:, -1:]], -1)
    return traj, action, proprio, None


def _berkeley_mvp(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :-1], _invert(a[:, -1:])], 1)
    proprio = tf.concat(
        [traj["observation"]["pose"],
         tf.cast(traj["observation"]["gripper"], tf.float32)[:, None]], -1
    )
    return traj, action, proprio, None


def _berkeley_rpt(traj):
    """30Hz -> 10Hz subsample, joint-delta actions recomputed."""
    tf = _tf()
    traj = _every_nth(traj, 3)
    joints = traj["observation"]["joint_pos"]
    joint_actions = joints[1:, :7] - joints[:-1, :7]
    out = tf.nest.map_structure(lambda x: x[:-1], traj)
    out["action"] = tf.concat(
        [joint_actions, _invert(traj["action"][:-1, -1:])], 1
    )
    proprio = tf.concat(
        [out["observation"]["joint_pos"],
         tf.cast(out["observation"]["gripper"], tf.float32)[:, None]], -1
    )
    return out, out["action"], proprio, None


def _kaist(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :6], tf.zeros_like(a[:, :1])], -1)
    return traj, action, traj["observation"]["state"][:, -7:], None


def _stanford_mask_vit(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :4], tf.zeros_like(a[:, :2]), a[:, -1:]], -1)
    e = traj["observation"]["end_effector_pose"]
    proprio = tf.concat([e[:, :4], tf.zeros_like(e[:, :2]), e[:, -1:]], -1)
    return traj, action, proprio, None


def _tokyo_lsmo(traj):
    tf = _tf()
    s = traj["observation"]["state"]
    return traj, traj["action"], tf.concat([s[:, :6], s[:, -1:]], -1), None


def _dlr_sara_pour(traj):
    return traj, traj["action"], traj["observation"]["state"], None


def _dlr_sara_grid_clamp(traj):
    return traj, traj["action"], traj["observation"]["state"][:, :6], None


def _dlr_edan(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :6], _invert(a[:, -1:])], -1)
    return traj, action, traj["observation"]["state"], None


def _asu_table_top(traj):
    tf = _tf()
    proprio = tf.concat(
        [traj["ground_truth_states"]["EE"], traj["observation"]["state"][:, -1:]], -1
    )
    return traj, traj["action"], proprio, None


def _robocook(traj):
    return traj, traj["action"], traj["observation"]["state"], None


def _imperial_wristcam(traj):
    return traj, traj["action"][..., :-1], None, None


def _iamlab_pick_insert(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat(
        [a[:, :3], quat_xyzw_to_euler(a[:, 3:7]), a[:, 7:8]], -1
    )
    s = traj["observation"]["state"]
    return traj, action, tf.concat([s[:, :7], s[:, 7:8]], -1), None


def _uiuc_d3field(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a, tf.zeros_like(a), tf.zeros_like(a[:, :1])], -1)
    return traj, action, None, None


def _utaustin_mutex(traj):
    return _invert_clip_gripper_tail(
        traj, lambda t: t["observation"]["state"][:, :8]
    )


def _berkeley_fanuc(traj):
    tf = _tf()
    s = traj["observation"]["state"]
    action = tf.concat([traj["action"], _invert(s[:, 6:7])], -1)
    proprio = tf.concat([s[:, :6], s[:, 6:7]], -1)
    return traj, action, proprio, None


def _cmu_food(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :3], quat_xyzw_to_euler(a[:, 3:7]), a[:, -1:]], -1)
    return traj, action, traj["observation"]["state"], None


def _playfusion(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :3], a[:, -4:]], -1)
    return traj, action, traj["observation"]["state"], None


def _cmu_stretch(traj):
    tf = _tf()
    s = traj["observation"]["state"]
    proprio = tf.concat([s[:, :3], tf.zeros_like(s[:, :3]), s[:, -1:]], -1)
    return traj, traj["action"][..., :-1], proprio, None


def _gnm(traj):
    """Navigation: subsample x3, recompute local-frame xy waypoints."""
    tf = _tf()

    def subsampled():
        scale = tf.linalg.norm(traj["action"][0]) / tf.maximum(
            tf.linalg.norm(
                traj["observation"]["position"][1] - traj["observation"]["position"][0]
            ),
            1e-8,
        )
        t = _every_nth(traj, 3)
        yaw = t["observation"]["yaw"]
        pos = t["observation"]["position"]
        rot = tf.convert_to_tensor(
            [[tf.cos(yaw), -tf.sin(yaw)], [tf.sin(yaw), tf.cos(yaw)]]
        )
        rot = tf.transpose(rot, [3, 2, 0, 1])[0]
        delta = pos[1:] - pos[:-1]
        action = tf.matmul(delta[:, None], rot[:-1])[:, 0] * scale
        t = tf.nest.map_structure(lambda x: x[:-1], t)
        t["action"] = action
        return t

    def empty():
        return tf.nest.map_structure(lambda x: x[:0], traj)

    traj = tf.cond(tf.shape(traj["action"])[0] > 1, subsampled, empty)
    # raw gnm episodes carry position/yaw, not a 'state' key: synthesize
    # proprio = [x, y, yaw] (reference gnm_dataset_transform concats the same)
    proprio = tf.concat(
        [traj["observation"]["position"],
         traj["observation"]["yaw"][..., None]
         if traj["observation"]["yaw"].shape.ndims == 1
         else traj["observation"]["yaw"]], -1,
    )
    return traj, traj["action"], proprio, None


def _aloha(traj):
    traj = _every_nth(traj, 5)  # 50Hz -> 10Hz
    return traj, traj["action"], traj["observation"]["state"], None


def _fmb(traj):
    tf = _tf()
    proprio = tf.concat(
        [traj["observation"]["eef_pose"],
         traj["observation"]["state_gripper_pose"][..., None]], -1
    )
    return traj, traj["action"], proprio, None


def _dobbe(traj):
    return traj, traj["action"], traj["observation"]["state"], None


def _roboset(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :7], _invert(_clip01(a[:, -1:]))], -1)
    return traj, action, traj["observation"]["state"], None


def _rh20t(traj):
    tf = _tf()
    act = traj["action"]
    action = tf.concat(
        [act["tcp_base"], tf.cast(act["gripper"][:, None], tf.float32)], -1
    )
    proprio = tf.concat(
        [traj["observation"]["tcp_base"],
         traj["observation"]["gripper_width"][..., None]], -1
    )
    return traj, action, proprio, None


def _mujoco_manip(traj):
    tf = _tf()
    a = traj["action"]
    action = tf.concat([a[:, :6], _invert(a[:, -1:] / 255.0)], -1)
    return traj, action, None, None


# ---------------------------------------------------------------------------
# dataset configs: {name: (image_keys, action_encoding, transform)}
# image_keys maps view -> raw observation key (None = view unavailable)
# ---------------------------------------------------------------------------

def _entry(primary=None, secondary=None, wrist=None, enc=EEF_POS, transform=None,
           lang=True, depth=None, depth_secondary=None, depth_wrist=None):
    """lang=False marks datasets whose transform BLANKs uninformative
    language — the unlabeled filter must not apply to them (it would drop
    every episode). depth*/depth_wrist mirror the reference's
    depth_obs_keys (`src/data/oxe/oxe_dataset_configs.py:42-`): raw
    observation keys for per-view depth, None where the view has none."""
    return {
        "image_keys": {"primary": primary, "secondary": secondary, "wrist": wrist},
        "depth_keys": {"primary": depth, "secondary": depth_secondary,
                       "wrist": depth_wrist},
        "action_encoding": enc,
        "transform": transform,
        "action_normalization_mask": ACTION_NORMALIZATION_MASKS[enc],
        "has_language": lang,
    }


_E = _entry
OXE_DATASET_CONFIGS: dict[str, dict] = {
    "fractal20220817_data": _E("image", transform=_rt1),
    "fractal_euler": _E("image", transform=_rt1),
    "kuka": _E("image", transform=_kuka, lang=False),
    "bridge_dataset": _E("image_0", secondary="image_1", transform=_bridge),
    "taco_play": _E("rgb_static", wrist="rgb_gripper", transform=_taco,
                    depth="depth_static", depth_wrist="depth_gripper"),
    "taco_play_libero": _E("rgb_static", wrist="rgb_gripper", transform=_taco_libero,
                           depth="depth_static", depth_wrist="depth_gripper"),
    "libero_spatial": _E("image", wrist="wrist_image", transform=_libero),
    "libero_object": _E("image", wrist="wrist_image", transform=_libero),
    "libero_goal": _E("image", wrist="wrist_image", transform=_libero),
    "libero_10": _E("image", wrist="wrist_image", transform=_libero),
    "libero_90": _E("image", wrist="wrist_image", transform=_libero),
    "jaco_play": _E("image", wrist="image_wrist", transform=_jaco_play),
    "berkeley_cable_routing": _E(
        "image", secondary="top_image", wrist="wrist45_image", transform=_cable_routing
    , lang=False),
    "roboturk": _E("front_rgb", transform=_roboturk, lang=False),
    "nyu_door_opening_surprising_effectiveness": _E(wrist="image", transform=_nyu_door, lang=False),
    "viola": _E("agentview_rgb", wrist="eye_in_hand_rgb", transform=_viola, lang=False),
    "berkeley_autolab_ur5": _E("image", wrist="hand_image", transform=_autolab_ur5,
                               depth="depth"),
    "toto": _E("image", transform=_toto, lang=False),
    "language_table": _E("rgb", transform=_language_table),
    "columbia_cairlab_pusht_real": _E("image", wrist="wrist_image", transform=_pusht),
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": _E(
        "image", transform=_stanford_kuka_mm, depth="depth_image"
    ),
    "nyu_rot_dataset_converted_externally_to_rlds": _E("image", transform=_nyu_rot),
    "stanford_hydra_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_stanford_hydra
    , lang=False),
    "austin_buds_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_austin_buds
    , lang=False),
    "nyu_franka_play_dataset_converted_externally_to_rlds": _E(
        "image", secondary="image_additional_view", transform=_nyu_franka_play,
        depth="depth", depth_secondary="depth_additional_view", lang=False),
    "maniskill_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_maniskill,
        depth="depth", depth_wrist="wrist_depth"
    ),
    "furniture_bench_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_furniture_bench
    ),
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": _E(
        "highres_image", transform=_cmu_franka_exploration
    ),
    "ucsd_kitchen_dataset_converted_externally_to_rlds": _E(
        "image", transform=_ucsd_kitchen
    ),
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": _E(
        "image", transform=_ucsd_pick_place
    ),
    "austin_sailor_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_austin_sailor
    , lang=False),
    "austin_sirius_dataset_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_austin_sirius
    , lang=False),
    "bc_z": _E("image", transform=_bc_z),
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": _E(
        "image", transform=_utokyo_pr2
    ),
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": _E(
        "image", transform=_utokyo_pr2
    ),
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": _E(
        "image", secondary="image2", wrist="hand_image",
        transform=_utokyo_xarm_pick_place,
    ),
    "utokyo_xarm_bimanual_converted_externally_to_rlds": _E(
        "image", transform=_utokyo_xarm_bimanual
    ),
    "robo_net": _E("image", secondary="image1", transform=_robo_net),
    "berkeley_mvp_converted_externally_to_rlds": _E(
        wrist="hand_image", enc=JOINT_POS, transform=_berkeley_mvp
    ),
    "berkeley_rpt_converted_externally_to_rlds": _E(
        wrist="hand_image", enc=JOINT_POS, transform=_berkeley_rpt
    ),
    "kaist_nonprehensile_converted_externally_to_rlds": _E("image", transform=_kaist),
    "stanford_mask_vit_converted_externally_to_rlds": _E(
        "image", transform=_stanford_mask_vit
    ),
    "tokyo_u_lsmo_converted_externally_to_rlds": _E("image", transform=_tokyo_lsmo),
    "dlr_sara_pour_converted_externally_to_rlds": _E("image", transform=_dlr_sara_pour),
    "dlr_sara_grid_clamp_converted_externally_to_rlds": _E(
        "image", transform=_dlr_sara_grid_clamp
    ),
    "dlr_edan_shared_control_converted_externally_to_rlds": _E(
        "image", transform=_dlr_edan
    ),
    "asu_table_top_converted_externally_to_rlds": _E("image", transform=_asu_table_top),
    "stanford_robocook_converted_externally_to_rlds": _E(
        "image_1", secondary="image_2", transform=_robocook,
        depth="depth_1", depth_secondary="depth_2"
    ),
    "imperialcollege_sawyer_wrist_cam": _E(
        "image", wrist="wrist_image", transform=_imperial_wristcam
    ),
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": _E(
        "image", wrist="wrist_image", transform=_iamlab_pick_insert
    ),
    "uiuc_d3field": _E("image_1", secondary="image_2", transform=_uiuc_d3field,
                       depth="depth_1", depth_secondary="depth_2"),
    "utaustin_mutex": _E("image", wrist="wrist_image", transform=_utaustin_mutex, lang=False),
    "berkeley_fanuc_manipulation": _E(
        "image", wrist="wrist_image", transform=_berkeley_fanuc
    ),
    "cmu_playing_with_food": _E(
        "image", wrist="finger_vision_1", transform=_cmu_food
    ),
    "cmu_play_fusion": _E("image", transform=_playfusion),
    "cmu_stretch": _E("image", transform=_cmu_stretch),
    "gnm_dataset": _E("image", enc=NAV_2D, transform=_gnm),
    "aloha_static_dataset": _E(
        "cam_high", secondary="cam_low", wrist="cam_right_wrist",
        enc=JOINT_POS_BIMANUAL, transform=_aloha,
    ),
    "aloha_dagger_dataset": _E(
        "cam_high", secondary="cam_low", wrist="cam_right_wrist",
        enc=JOINT_POS_BIMANUAL, transform=_aloha,
    ),
    "aloha_mobile_dataset": _E(
        "cam_high", wrist="cam_right_wrist",
        enc=JOINT_POS_BIMANUAL_NAV, transform=_aloha,
    ),
    "fmb_dataset": _E(
        "image_side_1", secondary="image_side_2", wrist="image_wrist_1", transform=_fmb,
        depth="image_side_1_depth", depth_secondary="image_side_2_depth",
        depth_wrist="image_wrist_1_depth"
    ),
    "dobbe": _E(wrist="wrist_image", transform=_dobbe),
    "roboset": _E(
        "image_left", secondary="image_right", wrist="image_wrist",
        enc=JOINT_POS, transform=_roboset,
    ),
    "rh20t": _E(
        "image_front", secondary="image_side_right", wrist="image_wrist",
        transform=_rh20t,
    ),
    "mujoco_manip": _E("image", transform=_mujoco_manip),
}


# ---------------------------------------------------------------------------
# canonicalization wrapper
# ---------------------------------------------------------------------------

def _canonicalize(traj, *, name: str, cameras: tuple[str, ...],
                  load_depth: bool = False):
    """Run the per-dataset transform, then assemble the canonical layout."""
    tf = _tf()
    entry = OXE_DATASET_CONFIGS[name]
    traj, action, proprio, language = entry["transform"](dict(traj))
    n = tf.shape(action)[0]

    obs = {}
    for cam in cameras:
        raw = entry["image_keys"].get(cam)
        key = "image_primary" if cam == "primary" else f"image_{cam}"
        if raw is not None:
            obs[key] = traj["observation"][raw]
        else:
            # padding camera: empty byte string, decoded to a zeros frame
            obs[key] = tf.fill([n], tf.constant("", tf.string))
        if load_depth:
            # depth pass-through (reference depth_obs_keys,
            # oxe_dataset_configs.py:42-): raw per-view depth under
            # depth_<view>; a view without depth gets a [T,1,1,1] zeros
            # placeholder so downstream structure is uniform per dataset
            draw = entry.get("depth_keys", {}).get(cam)
            dkey = f"depth_{cam}"
            if draw is not None:
                d = traj["observation"][draw]
                # png/jpeg-encoded depth passes through as bytes; numeric
                # depth is canonicalized to float32
                obs[dkey] = d if d.dtype == tf.string else tf.cast(d, tf.float32)
            else:
                obs[dkey] = tf.zeros(
                    tf.concat([[n], [1, 1, 1]], axis=0), tf.float32)

    if proprio is None:
        proprio = tf.zeros((n, 1), tf.float32)
    obs["proprio"] = tf.cast(proprio, tf.float32)

    if language is BLANK:
        language = tf.fill([n], tf.constant("", tf.string))
    elif language is None:
        language = traj.get("language_instruction", tf.fill([n], tf.constant("", tf.string)))

    return {
        "observation": obs,
        "task": {"language_instruction": language},
        "action": tf.cast(action, tf.float32),
    }


# ---------------------------------------------------------------------------
# named mixes (reference oxe_dataset_mixes.py)
# ---------------------------------------------------------------------------

BRIDGE_MIX = [("bridge_dataset", 1.0)]
FRACTAL_MIX = [("fractal20220817_data", 1.0)]
FRACTAL_EULER_MIX = [("fractal_euler", 1.0)]
TACO_MIX = [("taco_play", 1.0)]
TACO_LIBERO_MIX = [("taco_play_libero", 1.0)]
OXE_SIMPLE = [("fractal_euler", 1.0), ("bridge_dataset", 1.0)]
LIBERO_MIX = [
    ("libero_10", 1.0), ("libero_90", 1.0), ("libero_goal", 1.0),
    ("libero_object", 1.0), ("libero_spatial", 1.0),
]
RT_X_MIX = [
    ("fractal20220817_data", 0.54087122203),
    ("kuka", 0.8341046294),
    ("bridge_dataset", 1.0),
    ("taco_play", 2.0),
    ("jaco_play", 2.0),
    ("berkeley_cable_routing", 3.0),
    ("roboturk", 1.0),
    ("nyu_door_opening_surprising_effectiveness", 5.0),
    ("viola", 2.0),
    ("berkeley_autolab_ur5", 1.0),
    ("toto", 1.0),
]
OXE_FRANKA_MIX = [
    ("taco_play", 1.0),
    ("berkeley_cable_routing", 1.0),
    ("viola", 1.0),
    ("toto", 1.0),
    ("stanford_hydra_dataset_converted_externally_to_rlds", 1.0),
    ("austin_buds_dataset_converted_externally_to_rlds", 3.0),
    ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
    ("maniskill_dataset_converted_externally_to_rlds", 0.1),
    ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
    ("cmu_franka_exploration_dataset_converted_externally_to_rlds", 5.0),
    ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
    ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
    ("berkeley_rpt_converted_externally_to_rlds", 1.0),
    ("kaist_nonprehensile_converted_externally_to_rlds", 3.0),
    ("stanford_robocook_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("cmu_play_fusion", 1.0),
]
OXE_MAGIC_SOUP = [
    ("fractal20220817_data", 0.54087122203),
    ("kuka", 0.8341046294),
    ("bridge_dataset", 1.0),
    ("taco_play", 2.0),
    ("jaco_play", 1.0),
    ("berkeley_cable_routing", 1.0),
    ("roboturk", 2.0),
    ("nyu_door_opening_surprising_effectiveness", 1.0),
    ("viola", 2.0),
    ("berkeley_autolab_ur5", 2.0),
    ("toto", 1.0),
    ("language_table", 0.1),
    ("stanford_hydra_dataset_converted_externally_to_rlds", 2.0),
    ("austin_buds_dataset_converted_externally_to_rlds", 1.0),
    ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
    ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
    ("ucsd_kitchen_dataset_converted_externally_to_rlds", 2.0),
    ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
    ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
    ("bc_z", 0.2),
    ("dlr_edan_shared_control_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("berkeley_fanuc_manipulation", 2.0),
    ("cmu_stretch", 1.0),
]
OXE_FLEX_ACT_SOUP = OXE_MAGIC_SOUP[:20] + [
    ("berkeley_mvp_converted_externally_to_rlds", 1.0),
    ("dlr_edan_shared_control_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("berkeley_fanuc_manipulation", 2.0),
    ("cmu_stretch", 1.0),
    ("gnm_dataset", 1.0),
    ("aloha_static_dataset", 3.0),
    ("aloha_mobile_dataset", 2.0),
    ("dobbe", 1.0),
    ("roboset", 0.5),
    ("rh20t", 0.5),
]
OXE_FULL_MIX = [
    (name, 1.0) for name in OXE_DATASET_CONFIGS
    if name not in ("fractal_euler", "taco_play_libero", "mujoco_manip",
                    "libero_10", "libero_90", "libero_goal", "libero_object",
                    "libero_spatial", "aloha_static_dataset",
                    "aloha_dagger_dataset", "aloha_mobile_dataset",
                    "fmb_dataset", "dobbe", "roboset", "rh20t")
]

OXE_NAMED_MIXES: dict[str, list[tuple[str, float]]] = {
    "bridge": BRIDGE_MIX,
    "fractal": FRACTAL_MIX,
    "fractal_euler": FRACTAL_EULER_MIX,
    "taco": TACO_MIX,
    "taco_libero": TACO_LIBERO_MIX,
    "rtx": RT_X_MIX,
    "rtx_franka": RT_X_MIX + OXE_FRANKA_MIX,
    "oxe_magic_soup": OXE_MAGIC_SOUP,
    "oxe_flex_act_soup": OXE_FLEX_ACT_SOUP,
    "oxe_simple": OXE_SIMPLE,
    "libero": LIBERO_MIX,
    "oxe_full": OXE_FULL_MIX,
    "bridge_fractal": [("bridge_dataset", 1.0), ("fractal20220817_data", 1.0)],
}


# ---------------------------------------------------------------------------
# kwargs builder (reference oxe/__init__.py:14-140)
# ---------------------------------------------------------------------------

def make_oxe_dataset_kwargs(
    name: str,
    data_dir: str,
    load_camera_views: tuple[str, ...] = ("primary",),
    load_proprio: bool = True,
    load_depth: bool = False,
) -> dict:
    if name not in OXE_DATASET_CONFIGS:
        raise KeyError(
            f"Unknown OXE dataset {name!r}; available: {sorted(OXE_DATASET_CONFIGS)}"
        )
    cfg = OXE_DATASET_CONFIGS[name]
    # a requested view whose raw key is None becomes a padding camera
    # (reference: image_obs_keys values of None synthesize padding images);
    # only a view NAME outside the primary/secondary/wrist scheme is an error
    unknown = set(load_camera_views) - set(cfg["image_keys"])
    if unknown:
        raise ValueError(f"{name}: unknown camera views {sorted(unknown)}")
    return {
        "name": name,
        "data_dir": data_dir,
        "standardize_fn": functools.partial(
            _canonicalize, name=name, cameras=tuple(load_camera_views),
            load_depth=load_depth,
        ),
        "load_proprio": load_proprio,
        "action_normalization_mask": list(cfg["action_normalization_mask"]),
        # blank-language datasets must not hit the unlabeled filter
        "skip_unlabeled": cfg.get("has_language", True),
    }


def make_oxe_dataset_kwargs_and_weights(
    mix_name: str,
    data_dir: str,
    load_camera_views: tuple[str, ...] = ("primary",),
    load_proprio: bool = True,
    load_depth: bool = False,
) -> tuple[list[dict], list[float]]:
    """Named mix -> (per-dataset kwargs for make_dataset_from_rlds, weights)."""
    if mix_name in OXE_NAMED_MIXES:
        entries = OXE_NAMED_MIXES[mix_name]
    elif mix_name in OXE_DATASET_CONFIGS:
        entries = [(mix_name, 1.0)]
    else:
        raise KeyError(
            f"Unknown mix {mix_name!r}; available: {sorted(OXE_NAMED_MIXES)}"
        )
    # dedup repeated entries (concatenated mixes like rtx_franka list
    # taco_play/viola/toto twice): keep the FIRST weight, like the
    # reference's filter_datasets dedup — a duplicate would build two full
    # pipelines for the same data and double-count its transitions
    seen: set[str] = set()
    kwargs_list, weights = [], []
    for name, weight in entries:
        if name in seen:
            import logging

            logging.getLogger("intact_tpu.oxe").warning(
                "mix %r lists %s more than once; keeping the first weight",
                mix_name, name,
            )
            continue
        seen.add(name)
        kwargs_list.append(
            make_oxe_dataset_kwargs(name, data_dir, load_camera_views,
                                    load_proprio, load_depth)
        )
        weights.append(weight)
    return kwargs_list, weights


def register_dataset(name: str, config: dict) -> None:
    OXE_DATASET_CONFIGS[name] = config


def register_mix(name: str, entries: list[tuple[str, float]]) -> None:
    OXE_NAMED_MIXES[name] = entries
