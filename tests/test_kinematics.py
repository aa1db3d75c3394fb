"""Kinematics tests: URDF parsing, FK vs an independent numpy chain-walk
oracle, Jacobians vs finite differences, batching, re-rooting."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.models import RobotModel, parse_urdf_file

TWO_LINK = """
<robot name="two_link">
  <link name="base"/>
  <link name="upper"/>
  <link name="lower"/>
  <link name="tool"/>
  <joint name="shoulder" type="revolute">
    <parent link="base"/> <child link="upper"/>
    <origin xyz="0 0 0.5" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" velocity="2.0"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/> <child link="lower"/>
    <origin xyz="1 0 0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" velocity="3.0"/>
  </joint>
  <joint name="wrist" type="prismatic">
    <parent link="lower"/> <child link="tool"/>
    <origin xyz="1 0 0" rpy="0 0 1.5707963267948966"/>
    <axis xyz="1 0 0"/>
    <limit lower="0" upper="0.2" velocity="1.0"/>
  </joint>
</robot>
"""


def numpy_fk_oracle(urdf, link, q, joint_order):
    """Independent chain-walk FK in plain numpy (test oracle)."""
    root = urdf.get_root()
    T = np.eye(4)
    if link == root:
        return T
    for joint_name in urdf.get_chain(root, link, links=False):
        j = urdf.joint_map[joint_name]
        To = np.eye(4)
        To[:3, :3] = Rotation.from_euler("xyz", j.rpy).as_matrix()
        To[:3, 3] = j.xyz
        T = T @ To
        if j.type == "fixed":
            continue
        qi = q[joint_order.index(j.name)]
        M = np.eye(4)
        axis = np.asarray(j.axis, dtype=float)
        if j.type in ("revolute", "continuous"):
            M[:3, :3] = Rotation.from_rotvec(qi * axis / np.linalg.norm(axis)).as_matrix()
        elif j.type == "prismatic":
            M[:3, 3] = qi * axis
        T = T @ M
    return T


class TestTwoLink:
    def setup_method(self):
        self.robot = RobotModel(urdf_string=TWO_LINK, dtype=jnp.float64)

    def test_joint_bookkeeping(self):
        assert self.robot.ndof == 3
        assert self.robot.actuated_joint_names == ["shoulder", "elbow", "wrist"]
        np.testing.assert_allclose(self.robot.lower_actuated_joint_limits, [-1.5, -2.0, 0.0])
        np.testing.assert_allclose(self.robot.velocity_actuated_joint_limits, [2.0, 3.0, 1.0])

    def test_fk_analytic(self):
        q = np.array([0.0, 0.0, 0.1])
        T = np.asarray(self.robot.get_global_link_transform("tool", q))
        # shoulder at z=0.5, two unit links along x, prismatic along rotated x (=y)
        np.testing.assert_allclose(T[:3, 3], [2.0, 0.1, 0.5], atol=1e-12)

    def test_fk_matches_oracle(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            q = rng.uniform(-1.5, 1.5, size=3)
            for link in ["upper", "lower", "tool"]:
                want = numpy_fk_oracle(self.robot.urdf, link, q, self.robot.actuated_joint_names)
                got = np.asarray(self.robot.get_global_link_transform(link, q))
                np.testing.assert_allclose(got, want, atol=1e-10)

    def test_geometric_jacobian_vs_finite_difference(self):
        q = jnp.asarray([0.3, -0.7, 0.05], dtype=jnp.float64)
        J = np.asarray(self.robot.get_global_link_geometric_jacobian("tool", q))
        eps = 1e-7
        for i in range(3):
            dq = np.zeros(3)
            dq[i] = eps
            Tp = np.asarray(self.robot.get_global_link_transform("tool", q + dq))
            Tm = np.asarray(self.robot.get_global_link_transform("tool", q - dq))
            v = (Tp[:3, 3] - Tm[:3, 3]) / (2 * eps)
            np.testing.assert_allclose(J[:3, i], v, atol=1e-5)
            # angular: dR R^T = skew(w)
            T0 = np.asarray(self.robot.get_global_link_transform("tool", q))
            dR = (Tp[:3, :3] - Tm[:3, :3]) / (2 * eps)
            W = dR @ T0[:3, :3].T
            w = np.array([W[2, 1], W[0, 2], W[1, 0]])
            np.testing.assert_allclose(J[3:, i], w, atol=1e-5)

    def test_analytical_jacobian_finite_difference(self):
        q = jnp.asarray([0.2, 0.4, 0.1], dtype=jnp.float64)
        J = np.asarray(self.robot.get_global_link_analytical_jacobian("tool", q))
        assert J.shape == (6, 3)
        pos_fd = (
            np.asarray(self.robot.get_global_link_position("tool", q + jnp.array([1e-7, 0, 0])))
            - np.asarray(self.robot.get_global_link_position("tool", q - jnp.array([1e-7, 0, 0])))
        ) / 2e-7
        np.testing.assert_allclose(J[:3, 0], pos_fd, atol=1e-5)

    def test_batched_fk_vmap_jit(self):
        rng = np.random.default_rng(5)
        Q = rng.uniform(-1, 1, size=(4, 7, 3))
        T = np.asarray(self.robot.get_global_link_transform("tool", Q))
        assert T.shape == (4, 7, 4, 4)
        for b in (0, 3):
            for t in (0, 6):
                want = np.asarray(self.robot.get_global_link_transform("tool", Q[b, t]))
                np.testing.assert_allclose(T[b, t], want, atol=1e-10)

    def test_link_transform_relative(self):
        q = np.array([0.3, 0.2, 0.1])
        T_rel = np.asarray(self.robot.get_link_transform("tool", q, "lower"))
        T_l = np.asarray(self.robot.get_global_link_transform("lower", q))
        T_t = np.asarray(self.robot.get_global_link_transform("tool", q))
        np.testing.assert_allclose(T_l @ T_rel, T_t, atol=1e-12)

    def test_add_base_frame(self):
        robot = RobotModel(urdf_string=TWO_LINK, dtype=jnp.float64)
        q = np.array([0.1, 0.2, 0.05])
        T_before = np.asarray(robot.get_global_link_transform("tool", q))
        robot.add_base_frame("world", xyz=[1.0, 2.0, 3.0])
        T_after = np.asarray(robot.get_global_link_transform("tool", q))
        np.testing.assert_allclose(T_after[:3, 3], T_before[:3, 3] + [1, 2, 3], atol=1e-10)

    def test_grad_through_fk(self):
        def loss(q):
            return jnp.sum(self.robot.get_global_link_position("tool", q) ** 2)

        g = jax.grad(loss)(jnp.asarray([0.3, -0.2, 0.1], dtype=jnp.float64))
        eps = 1e-6
        for i in range(3):
            dq = np.zeros(3)
            dq[i] = eps
            fd = (loss(jnp.asarray([0.3, -0.2, 0.1]) + dq) - loss(jnp.asarray([0.3, -0.2, 0.1]) - dq)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g)[i], np.asarray(fd), atol=1e-5)


class TestReferenceRobots:
    """Parse the real Panda/Fetch URDFs and validate the reference's
    documented joint bookkeeping (data/configs/*.yaml; SURVEY.md §6)."""

    def test_panda(self, data_dir):
        robot = RobotModel(
            urdf_filename=f"{data_dir}/robots/panda/panda.urdf",
            param_joints=["panda_finger_joint1", "panda_finger_joint2"],
            dtype=jnp.float64,
        )
        assert robot.ndof == 9
        assert robot.num_opt_joints == 7
        assert robot.num_param_joints == 2
        assert robot.parameter_joint_indexes == [7, 8]

        # FK oracle check on random configurations
        rng = np.random.default_rng(11)
        for _ in range(3):
            q = rng.uniform(-1, 1, size=9)
            for link in ["panda_link4", "panda_hand", "panda_leftfinger"]:
                want = numpy_fk_oracle(robot.urdf, link, q, robot.actuated_joint_names)
                got = np.asarray(robot.get_global_link_transform(link, q))
                np.testing.assert_allclose(got, want, atol=1e-10)

    def test_fetch(self, data_dir):
        param_joints = [
            "r_wheel_joint", "l_wheel_joint", "torso_lift_joint", "head_pan_joint",
            "head_tilt_joint", "r_gripper_finger_joint", "l_gripper_finger_joint",
            "bellows_joint",
        ]
        robot = RobotModel(
            urdf_filename=f"{data_dir}/robots/fetch/fetch.urdf",
            param_joints=param_joints,
            dtype=jnp.float64,
        )
        assert robot.ndof == 15
        assert robot.num_param_joints == 8
        assert robot.num_opt_joints == 7

        rng = np.random.default_rng(13)
        q = rng.uniform(-0.5, 0.5, size=15)
        for link in ["gripper_link", "wrist_roll_link", "torso_lift_link"]:
            want = numpy_fk_oracle(robot.urdf, link, q, robot.actuated_joint_names)
            got = np.asarray(robot.get_global_link_transform(link, q))
            np.testing.assert_allclose(got, want, atol=1e-10)

    @pytest.mark.parametrize(
        "rel,some_link",
        [
            ("robots/kuka_lwr/kuka_lwr.urdf", None),
            ("robots/nextage/nextage.urdf", None),
            ("robots/r2d2/r2d2.urdf", None),
            ("robots/planar_3dof.urdf", None),
            ("robots/panda/panda_gripper.urdf", None),
            ("robots/fetch/fetch_gripper.urdf", None),
        ],
    )
    def test_all_reference_robots_load_and_fk(self, data_dir, rel, some_link):
        """Every URDF the reference ships parses and FKs (the reference's
        supported-model roster: pybullet_api.py:534-577)."""
        robot = RobotModel(urdf_filename=f"{data_dir}/{rel}", dtype=jnp.float64)
        assert robot.ndof >= 1
        q = np.zeros(robot.ndof)
        frames = np.asarray(robot.fk_all(jnp.asarray(q)))
        assert np.isfinite(frames).all()
        # spot-check one non-root link against the oracle
        link = some_link or robot.link_names[-1]
        want = numpy_fk_oracle(robot.urdf, link, q, robot.actuated_joint_names)
        got = np.asarray(robot.get_global_link_transform(link, jnp.asarray(q)))
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_fk_components_match_matrix_fk(self, data_dir):
        """The layout-optimized component FK must agree with the matrix FK
        on every frame, batched, for both Panda (revolute+prismatic) and
        the two-link test chain."""
        for make in (
            lambda: RobotModel(urdf_string=TWO_LINK, dtype=jnp.float64),
            lambda: RobotModel(urdf_filename=f"{data_dir}/robots/panda/panda.urdf", dtype=jnp.float64),
        ):
            robot = make()
            rng = np.random.default_rng(7)
            Q = jnp.asarray(rng.uniform(-1, 1, size=(3, 4, robot.ndof)))
            frames = np.asarray(robot.fk_all(Q))
            AR, At = robot.fk_components(Q)
            F = frames.shape[-3]
            for i in range(3):
                for j in range(3):
                    np.testing.assert_allclose(
                        np.asarray(AR[i][j]), frames[..., :, i, j], atol=1e-10
                    )
                np.testing.assert_allclose(np.asarray(At[i]), frames[..., :, i, 3], atol=1e-10)
            # frame_matrix assembles correctly
            for f in (0, F - 1):
                M = np.asarray(robot.frame_matrix((AR, At), f))
                np.testing.assert_allclose(M, frames[..., f, :, :], atol=1e-10)

    def test_assemble_extract_roundtrip(self, data_dir):
        robot = RobotModel(
            urdf_filename=f"{data_dir}/robots/panda/panda.urdf",
            param_joints=["panda_finger_joint1", "panda_finger_joint2"],
            dtype=jnp.float64,
        )
        q = jnp.asarray(np.random.default_rng(1).uniform(size=9))
        q_opt = robot.extract_optimized_dimensions(q[:, None])[:, 0]
        q_par = robot.extract_parameter_dimensions(q[:, None])[:, 0]
        back = robot.assemble_q(q_opt, q_par)
        np.testing.assert_allclose(np.asarray(back), np.asarray(q), atol=0)
