"""Tests for the env layer's pure-math pieces (pybullet-free)."""

import json

import numpy as np
import pytest

from grasptrajopt_tpu.envs import (
    HAS_PYBULLET,
    PathFinderController,
    angle_mod,
    depth_from_ndc,
    diff_drive_wheel_velocities,
    parse_grasps,
    pose_from_position_quaternion,
    projection_to_intrinsics,
    se3_inverse,
)


class TestCameraMath:
    def test_depth_from_ndc_roundtrip(self):
        near, far = 0.1, 10.0
        z = np.array([0.5, 1.0, 3.0, 9.0])
        ndc = (far / (far - near)) * (1 - near / z)
        np.testing.assert_allclose(depth_from_ndc(ndc, near, far), z, atol=1e-9)

    def test_projection_to_intrinsics(self):
        # GL projection for fov=45, 640x480
        fov, w, h = 45.0, 640, 480
        f = 1.0 / np.tan(np.radians(fov) / 2)
        aspect = w / h
        proj = np.zeros((4, 4))
        proj[0, 0] = f / aspect
        proj[1, 1] = f
        proj[2, 2] = -1.0
        proj[3, 2] = -1.0
        K = projection_to_intrinsics(proj.T.flatten(), w, h)
        # vertical focal length in pixels
        np.testing.assert_allclose(K[0, 0], h / 2 * f, atol=1e-9)
        np.testing.assert_allclose(K[0, 2], w / 2, atol=0)

    def test_se3_inverse(self):
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation

        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=1).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        np.testing.assert_allclose(se3_inverse(T) @ T, np.eye(4), atol=1e-12)

    def test_pose_from_position_quaternion(self):
        T = pose_from_position_quaternion([1, 2, 3], [1, 0, 0, 0])
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=0)


class TestControllers:
    def test_angle_mod(self):
        assert abs(angle_mod(-4.0) - 2.28318531) < 1e-6
        np.testing.assert_allclose(angle_mod([-150.0, 190.0, 350], degree=True), [-150, -170, -10])

    def test_path_controller_drives_toward_goal(self):
        ctrl = PathFinderController(1, 1, 3)
        rho, v, w = ctrl.calc_control_xy(1.0, 0.0, 0.0)  # goal straight ahead
        assert rho == 1.0 and v > 0 and abs(w) < 1e-9
        # goal behind: reverse
        rho, v, w = ctrl.calc_control_xy(-1.0, 0.0, 0.0)
        assert v < 0

    def test_diff_drive(self):
        # pure forward: both wheels equal and positive
        r, l = diff_drive_wheel_velocities(0.1, 0.0)
        assert r == l > 0
        # pure rotation: opposite signs
        r, l = diff_drive_wheel_velocities(0.0, 0.5)
        assert r > 0 > l
        np.testing.assert_allclose(r, 0.5 * 0.186 / 0.0613, atol=1e-9)


class TestGrasps:
    def test_parse_grasps_json(self, tmp_path):
        data = {
            "grasps": [
                {"pose": [0.1, 0.2, 0.3, 0, 0, 0, 1]},  # identity rotation
                {"pose": [0, 0, 0, 1, 0, 0, 0]},  # 180 deg about x
            ]
        }
        f = tmp_path / "g.json"
        f.write_text(json.dumps(data))
        RT = parse_grasps(str(f))
        assert RT.shape == (2, 4, 4)
        np.testing.assert_allclose(RT[0, :3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(RT[0, :3, 3], [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(RT[1, :3, :3], np.diag([1, -1, -1]), atol=1e-6)


def test_pybullet_gating():
    # with no pybullet (real or fake) the package must still import, with
    # the simulator classes absent. Check the module's CURRENT state: the
    # fake-backend tests may have installed the emulator and reloaded envs
    # earlier in the session, which legitimately enables the gate.
    import grasptrajopt_tpu.envs as envs

    if envs.HAS_PYBULLET:
        assert hasattr(envs, "SceneReplicaEnv")
    else:
        assert not hasattr(envs, "SceneReplicaEnv")
