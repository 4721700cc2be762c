"""Geometry conversion tests: round trips + convention pins.

Conventions under test: sxyz (extrinsic XYZ) Euler angles, [w,x,y,z]
quaternions — the Bridge/Simpler adapter assumptions.
"""

import numpy as np
import pytest

from intact_tpu.utils import geometry as geo


def random_euler(rng):
    return rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, size=3)


class TestRoundTrips:
    def test_euler_mat_roundtrip(self, rng):
        for _ in range(50):
            e = random_euler(rng)
            np.testing.assert_allclose(geo.mat2euler(geo.euler2mat(*e)), e, atol=1e-9)

    def test_euler_quat_mat_consistency(self, rng):
        for _ in range(50):
            e = random_euler(rng)
            q = geo.euler2quat(*e)
            np.testing.assert_allclose(geo.quat2mat(q), geo.euler2mat(*e), atol=1e-9)
            np.testing.assert_allclose(geo.quat2euler(q), e, atol=1e-9)

    def test_euler2axangle_matches_matrix(self, rng):
        from scipy.spatial.transform import Rotation

        for _ in range(50):
            e = random_euler(rng)
            axis, angle = geo.euler2axangle(*e)
            np.testing.assert_allclose(np.linalg.norm(axis), 1.0, atol=1e-12)
            R = Rotation.from_rotvec(axis * angle).as_matrix()
            np.testing.assert_allclose(R, geo.euler2mat(*e), atol=1e-9)


class TestConventions:
    def test_sxyz_is_extrinsic_xyz(self):
        # sxyz: R = Rz(ak) @ Ry(aj) @ Rx(ai); pure yaw about fixed z
        R = geo.euler2mat(0, 0, np.pi / 2)
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_quaternion_is_w_first(self):
        # 90 deg about z: q = [cos45, 0, 0, sin45]
        q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        R = geo.quat2mat(q)
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_identity_edge_cases(self):
        axis, angle = geo.euler2axangle(0, 0, 0)
        np.testing.assert_allclose(axis, [1, 0, 0])
        assert angle == 0.0
        axis, angle = geo.quat2axangle(np.array([1.0, 0, 0, 0]))
        assert angle == 0.0
        np.testing.assert_allclose(geo.quat2mat(np.zeros(4)), np.eye(3))

    def test_quat2axisangle(self):
        q = np.array([np.cos(0.3), 0, 0, np.sin(0.3)])
        np.testing.assert_allclose(geo.quat2axisangle(q), [0, 0, 0.6], atol=1e-12)

    def test_quat2axangle_negative_w_transforms3d_convention(self):
        """w < 0 must give theta = 2*acos(w) > pi with the UNFLIPPED axis
        (transforms3d/robosuite convention the Libero proprio statistics
        were computed with) — not scipy's canonicalized (<= pi, flipped)."""
        q = np.array([-np.sqrt(0.5), np.sqrt(0.5), 0, 0])  # w = -1/sqrt(2)
        axis, angle = geo.quat2axangle(q)
        np.testing.assert_allclose(angle, 1.5 * np.pi, atol=1e-12)
        np.testing.assert_allclose(axis, [1, 0, 0], atol=1e-12)
        # same rotation as scipy's canonical form, different 3-vector
        np.testing.assert_allclose(
            geo.quat2mat(q),
            geo.quat2mat(np.array([np.sqrt(0.5), -np.sqrt(0.5), 0, 0])),
            atol=1e-12,
        )

    def test_isrotation(self):
        assert geo.isrotation(np.eye(3))
        assert not geo.isrotation(np.eye(3) * 2)
        assert not geo.isrotation(np.zeros((2, 2)))


class TestImageOps:
    def test_process_revert_roundtrip(self, rng):
        from intact_tpu.utils.pipeline import process_images, revert_processed_images

        img = rng.integers(0, 256, size=(2, 3, 8, 8)).astype(np.uint8)
        out = process_images(img)
        assert out.min() >= -1.0 and out.max() <= 1.0
        back = revert_processed_images(out)
        np.testing.assert_array_equal(back, img)

    def test_metric_accuracy(self):
        import jax.numpy as jnp

        from intact_tpu.utils.metric import get_action_accuracy

        gt = jnp.zeros((2, 4, 7))
        pred = jnp.full((2, 4, 7), 0.15)
        accs = get_action_accuracy(gt, pred, thresholds=[0.1, 0.2])
        np.testing.assert_allclose(np.asarray(accs), [0.0, 1.0])
