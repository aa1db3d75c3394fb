"""Execution coverage for the PyBullet simulation layer via the fake backend.

The reference's envs layer is only ever exercised inside a real PyBullet
process; here `envs/fake_pybullet.py` stands in for the engine so that
every line of `envs/pybullet_api.py` and `envs/scene_replica.py` (joint
discovery, control, plan execution, camera observation, scene setup,
reward, retract ladder) actually runs headless. Index conventions are
asserted against the reference's hardcoded values
(/root/reference/examples/pybullet_api.py:263-330).
"""

import os

import numpy as np
import pytest
import scipy.io

from grasptrajopt_tpu.envs import fake_pybullet as fp

DATA_DIR = os.environ.get("GTO_DATA_DIR", "/root/reference/data")
PANDA_URDF = os.path.join(DATA_DIR, "robots", "panda", "panda.urdf")
FETCH_URDF = os.path.join(DATA_DIR, "robots", "fetch", "fetch.urdf")


@pytest.fixture(scope="module", autouse=True)
def _install_fake():
    assert fp.install(force=True)
    yield
    fp.disconnect()


@pytest.fixture()
def fresh_world():
    fp.resetSimulation()
    yield


# -- raw fake API -------------------------------------------------------------


class TestFakeBackend:
    def test_panda_joint_indexing_matches_reference(self, fresh_world):
        """DFS joint order must reproduce the reference's hardcoded panda
        indices: ee link 7 (panda_hand), camera link 10, 9 movable."""
        uid = fp.loadURDF(fileName=PANDA_URDF, useFixedBase=1, basePosition=[0, 0, 0])
        n = fp.getNumJoints(uid)
        assert n == 11
        names = [fp.getJointInfo(uid, i)[1].decode() for i in range(n)]
        links = [fp.getJointInfo(uid, i)[12].decode() for i in range(n)]
        assert links[7] == "panda_hand"
        assert links[10] == "panda_hand_camera"
        movable = [
            i for i in range(n)
            if fp.getJointInfo(uid, i)[2] in (fp.JOINT_REVOLUTE, fp.JOINT_PRISMATIC)
        ]
        assert len(movable) == 9
        assert names[8] == "panda_finger_joint1"

    def test_fetch_joint_indexing_matches_reference(self, fresh_world):
        """Fetch: wheels joints 0/1, camera link 7, ee link 16 (wrist_roll),
        fingers q[12]/q[13], 15 movable (pybullet_api.py:309-330)."""
        uid = fp.loadURDF(fileName=FETCH_URDF, useFixedBase=1, basePosition=[0, 0, 0])
        n = fp.getNumJoints(uid)
        info = [fp.getJointInfo(uid, i) for i in range(n)]
        names = [t[1].decode() for t in info]
        links = [t[12].decode() for t in info]
        assert names[0] == "r_wheel_joint" and names[1] == "l_wheel_joint"
        assert links[7] == "head_camera_rgb_optical_frame"
        assert links[16] == "wrist_roll_link"
        movable = [i for i in range(n) if info[i][2] != fp.JOINT_FIXED]
        assert len(movable) == 15
        assert names[movable[12]] == "r_gripper_finger_joint"
        assert names[movable[13]] == "l_gripper_finger_joint"

    def test_fk_matches_kinematic_model(self, fresh_world):
        """Fake link transforms == the framework's own FK at a random q."""
        from grasptrajopt_tpu.models.kinematics import KinematicModel
        from grasptrajopt_tpu.models.urdf import parse_urdf_file

        uid = fp.loadURDF(fileName=PANDA_URDF, useFixedBase=1, basePosition=[0, 0, 0])
        body = fp._world.bodies[uid]
        rng = np.random.default_rng(3)
        q = rng.uniform(-1.0, 1.0, size=9)
        for idx, val in zip(body.movable_joints(), q):
            fp.resetJointState(uid, idx, val)

        km = KinematicModel(parse_urdf_file(PANDA_URDF))
        import jax.numpy as jnp

        frames = np.asarray(km.fk_fn(dtype=jnp.float64)(jnp.asarray(q)))
        for link_idx, link_name in [(7, "panda_hand"), (10, "panda_hand_camera")]:
            pos, orn = fp.getLinkState(uid, link_idx)[:2]
            T = frames[km.frame_of(link_name)]
            np.testing.assert_allclose(pos, T[:3, 3], atol=1e-9)

    def test_camera_image_roundtrip(self, fresh_world, tmp_path):
        """getCameraImage NDC depth -> depth_from_ndc recovers metric depth
        of a box placed in front of the camera."""
        from grasptrajopt_tpu.envs.camera import depth_from_ndc, se3_inverse
        from grasptrajopt_tpu.envs.render import look_at_pose

        box = str(tmp_path / "_fake_box.urdf")
        _write_box_urdf(box, 0.4, 0.4, 0.4)
        fp.loadURDF(fileName=box, basePosition=[1.0, 0.0, 0.0])
        near, far = 0.1, 10.0
        proj = fp.computeProjectionMatrixFOV(45, 320 / 240, near, far)
        cam_pose = look_at_pose([0.0, 0.0, 0.0], [1.0, 0.0, 0.0])
        # GL view matrix: world->camera with z backward / y up
        flip = np.eye(4)
        flip[1, 1] = flip[2, 2] = -1.0
        view = se3_inverse(cam_pose @ flip).T.flatten().tolist()
        w, h, rgba, ndc, mask = fp.getCameraImage(
            width=320, height=240, viewMatrix=view, projectionMatrix=proj
        )
        assert rgba.shape == (240, 320, 4) and mask.shape == (240, 320)
        depth = depth_from_ndc(ndc, near, far)
        center = depth[120, 160]
        assert abs(center - 0.8) < 0.01  # box front face at x=0.8
        assert mask[120, 160] == 0
        assert depth[0, 0] == pytest.approx(far, rel=1e-5)  # FAR background
        assert mask[0, 0] == -1


    def test_ik_is_side_effect_free_and_honors_orientation(self, fresh_world):
        """calculateInverseKinematics must not move the robot (real-engine
        contract) and must satisfy targetOrientation when given."""
        uid = fp.loadURDF(fileName=PANDA_URDF, useFixedBase=1, basePosition=[0, 0, 0])
        body = fp._world.bodies[uid]
        q_home = [0.0, -1.0, 0.0, -2.2, 0.0, 1.6, 0.8, 0.02, 0.02]
        for idx, val in zip(body.movable_joints(), q_home):
            fp.resetJointState(uid, idx, val)
        q_before = body.q.copy()
        pos0, orn0 = fp.getLinkState(uid, 7)[:2]
        target = (pos0[0], pos0[1], pos0[2] + 0.08)
        sol = fp.calculateInverseKinematics(uid, 7, target, targetOrientation=orn0)
        np.testing.assert_array_equal(body.q, q_before)  # no mutation
        for idx, val in zip(body.movable_joints(), sol):
            fp.resetJointState(uid, idx, val)
        pos1, orn1 = fp.getLinkState(uid, 7)[:2]
        assert np.linalg.norm(np.array(pos1) - np.array(target)) < 5e-3
        # quaternion angle between solution and requested orientation
        dot = abs(float(np.dot(orn1, orn0)))
        assert np.degrees(2 * np.arccos(min(dot, 1.0))) < 5.0


from fake_dataset import make_mini_dataset as _make_mini_dataset  # noqa: E402
from fake_dataset import write_box_urdf as _write_box_urdf  # noqa: E402


# -- envs/pybullet_api.py -----------------------------------------------------


class TestPybulletApi:
    def test_panda_wrapper(self, fresh_world):
        from grasptrajopt_tpu.envs.pybullet_api import Panda, PyBulletSession

        sess = PyBulletSession(dt=0.02, add_floor=True, gui=False)
        robot = Panda(PANDA_URDF)
        assert robot.ndof == 9
        q0 = robot.default_pose()
        robot.reset(q0)
        np.testing.assert_allclose(robot.q(), q0, atol=1e-12)

        # position control slews toward the commanded target
        q1 = q0.copy()
        q1[0] += 0.3
        robot.cmd(q1)
        for _ in range(200):
            fp.stepSimulation()
        np.testing.assert_allclose(robot.q(), q1, atol=1e-6)

        # plan execution lands on the final waypoint
        plan = np.linspace(q0, q1, 8).T  # (9, 8)
        robot.execute_plan(plan, num=30)
        np.testing.assert_allclose(robot.q(), q1, atol=1e-6)

        robot.close_gripper()
        assert robot.q()[-1] == pytest.approx(0.0, abs=1e-8)
        robot.open_gripper()
        assert robot.q()[-1] == pytest.approx(0.04, abs=1e-8)

        view, pose = robot.get_camera_pose()
        assert len(view) == 16 and pose.shape == (4, 4)
        sess.close()

    def test_fetch_wrapper_and_base_driving(self, fresh_world):
        from grasptrajopt_tpu.envs.pybullet_api import Fetch

        robot = Fetch(FETCH_URDF, fix_base=0)
        assert robot.ndof == 15
        robot.reset(robot.default_pose())
        robot.look_at(10.0, 20.0)
        q = robot.q()
        assert q[3] == pytest.approx(np.radians(10.0), abs=1e-6)
        assert q[4] == pytest.approx(np.radians(20.0), abs=1e-6)

        view, pose = robot.get_camera_pose()
        assert len(view) == 16 and pose.shape == (4, 4)

        # closed-loop differential drive (realtime emulation integrates the
        # base between get_base_pose queries)
        fp.setRealTimeSimulation(1)
        robot.move_to_xy(0.05, 0.0)
        x, y, theta = robot.get_base_pose()
        assert abs(x - 0.05) < 0.02 and abs(y) < 0.02
        robot.move_to_theta(0.1)
        _, _, theta = robot.get_base_pose()
        assert abs(theta - 0.1) < 0.05
        fp.setRealTimeSimulation(0)


# -- envs/scene_replica.py ----------------------------------------------------


class TestSceneReplicaEnv:
    @pytest.mark.slow
    def test_tabletop_closed_loop(self, fresh_world, tmp_path):
        from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv

        names = _make_mini_dataset(str(tmp_path))
        env = SceneReplicaEnv(
            PANDA_URDF,
            data_dir=str(tmp_path),
            assets_dir=DATA_DIR,
            robot_name="panda",
            scene_type="tabletop",
            gui=False,
        )
        assert env.robot.ndof == 9
        assert all(env.RT_grasps[n].shape == (2, 4, 4) for n in env.ycb_object_names)

        meta = env.setup_scene(10)
        fp.setRealTimeSimulation(0)
        pos, orn = env.get_object_pose(names[0])
        assert abs(pos[0] - 0.7) < 1e-6 and abs(pos[1] + 0.15) < 1e-6

        rgba, depth, mask, cam_pose, K = env.get_observation()
        assert depth.shape == (480, 640) and rgba.shape == (480, 640, 4)
        assert K.shape == (3, 3)
        # metric depth bounded by [near, far]; empty pixels are FAR (never 0)
        assert depth.min() >= env.near and depth.max() <= env.far * (1 + 1e-5)
        assert (depth < 2.0).any()
        table_px = (mask == env.table_id).sum()
        assert table_px > 100

        # kinematic grasp: drive the gripper near the object, close, lift
        fp.set_grasp_rule(
            env.robot._id, env.robot.ee_index, [8, 9], close_thresh=0.02, reach=0.4
        )
        env.reset_scene(names)
        env.record_gripper_position()
        env.robot.close_gripper()  # attaches the nearest box within reach?
        env.retract(retract_distance=0.2)  # IK ladder straight up
        reward = env.compute_reward(names[0])
        assert reward in (0, 1)

        # executing a plan through the env surface
        q0 = np.asarray(env.robot.q())
        plan = np.linspace(q0, env.robot.default_pose(), 5).T
        env.robot.execute_plan(plan, num=20)

    @pytest.mark.slow
    def test_shelf_scene_generation(self, fresh_world, tmp_path):
        from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv

        _make_mini_dataset(str(tmp_path))
        env = SceneReplicaEnv(
            PANDA_URDF,
            data_dir=str(tmp_path),
            assets_dir=DATA_DIR,
            robot_name="panda",
            scene_type="shelf",
            gui=False,
        )
        meta = env.setup_scene(77)
        fp.setRealTimeSimulation(0)
        # procedural shelf meta was generated, persisted, and applied
        path = os.path.join(str(tmp_path), "shelf_scenes", "metadata", "meta-000077.mat")
        assert os.path.exists(path)
        assert len(env.meta_poses) == 6
        # second setup reloads the SAME cached scene
        env2_meta = scipy.io.loadmat(path)
        assert len(env2_meta["object_names"]) == 6
