"""Inverse dynamics tests: analytic pendulum oracle, mass-matrix
properties, energy consistency, and the real Panda URDF."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.models import RobotModel
from grasptrajopt_tpu.models.dynamics import (
    coriolis_vector,
    gravity_vector,
    make_inverse_dynamics,
    mass_matrix,
)

PENDULUM = """
<robot name="pendulum">
  <link name="base"/>
  <link name="bob">
    <inertial>
      <origin xyz="0 0 -0.8"/>
      <mass value="2.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
  </link>
  <joint name="pivot" type="revolute">
    <parent link="base"/><child link="bob"/>
    <origin xyz="0 0 1.5"/><axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" velocity="10"/>
  </joint>
</robot>
"""

DOUBLE_PENDULUM = """
<robot name="double_pendulum">
  <link name="base"/>
  <link name="l1">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.0"/>
      <inertia ixx="0.02" ixy="0" ixz="0" iyy="0.02" iyz="0" izz="0.001"/></inertial>
  </link>
  <link name="l2">
    <inertial><origin xyz="0 0 -0.4"/><mass value="0.7"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.001"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/><origin xyz="0 0 2"/>
    <axis xyz="0 1 0"/><limit lower="-3.14" upper="3.14" velocity="10"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/><origin xyz="0 0 -1"/>
    <axis xyz="0 1 0"/><limit lower="-3.14" upper="3.14" velocity="10"/>
  </joint>
</robot>
"""


class TestPendulum:
    def setup_method(self):
        self.robot = RobotModel(urdf_string=PENDULUM, dtype=jnp.float64)
        self.idyn = make_inverse_dynamics(self.robot)
        self.m, self.l, self.g = 2.0, 0.8, 9.81

    def test_analytic_torque(self):
        """Point pendulum: tau = m l^2 qdd + m g l sin(q)."""
        for q, qd, qdd in [(0.0, 0.0, 0.0), (0.5, 0.3, -0.2), (-1.2, 1.0, 2.0)]:
            tau = float(self.idyn(jnp.asarray([q]), jnp.asarray([qd]), jnp.asarray([qdd]))[0])
            want = self.m * self.l**2 * qdd + self.m * self.g * self.l * np.sin(q)
            np.testing.assert_allclose(tau, want, atol=1e-9)

    def test_gravity_vector(self):
        gv = np.asarray(gravity_vector(self.robot, jnp.asarray([0.7])))
        np.testing.assert_allclose(gv, [self.m * self.g * self.l * np.sin(0.7)], atol=1e-9)

    def test_mass_matrix(self):
        M = np.asarray(mass_matrix(self.robot, jnp.asarray([0.3])))
        np.testing.assert_allclose(M, [[self.m * self.l**2]], atol=1e-9)


class TestDoublePendulum:
    def setup_method(self):
        self.robot = RobotModel(urdf_string=DOUBLE_PENDULUM, dtype=jnp.float64)

    def test_mass_matrix_symmetric_pd(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = jnp.asarray(rng.uniform(-1, 1, size=2))
            M = np.asarray(mass_matrix(self.robot, q))
            np.testing.assert_allclose(M, M.T, atol=1e-10)
            assert np.linalg.eigvalsh(M).min() > 0

    def test_decomposition_consistency(self):
        """idyn(q,qd,qdd) == M qdd + C(q,qd) + g(q)."""
        rng = np.random.default_rng(1)
        idyn = make_inverse_dynamics(self.robot)
        q = jnp.asarray(rng.uniform(-1, 1, size=2))
        qd = jnp.asarray(rng.uniform(-1, 1, size=2))
        qdd = jnp.asarray(rng.uniform(-1, 1, size=2))
        tau = np.asarray(idyn(q, qd, qdd))
        M = np.asarray(mass_matrix(self.robot, q))
        c = np.asarray(coriolis_vector(self.robot, q, qd))
        gv = np.asarray(gravity_vector(self.robot, q))
        np.testing.assert_allclose(tau, M @ np.asarray(qdd) + c + gv, atol=1e-9)

    def test_passivity_energy_rate(self):
        """d/dt KE = qd . (tau - g - friction-free): with qdd from forward
        dynamics under zero torque, total energy is conserved:
        qd.(M qdd + C qd + g) = 0 along free motion."""
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.uniform(-1, 1, size=2))
        qd = jnp.asarray(rng.uniform(-1, 1, size=2))
        M = np.asarray(mass_matrix(self.robot, q))
        c = np.asarray(coriolis_vector(self.robot, q, qd))
        gv = np.asarray(gravity_vector(self.robot, q))
        qdd_free = np.linalg.solve(M, -(c + gv))
        # energy rate = qd.M qdd + 1/2 qd.Mdot qd + qd.g; equals qd.(Mqdd+C+g)
        # by the passivity property (Mdot - 2C skew): must vanish here
        rate = np.asarray(qd) @ (M @ qdd_free + c + gv)
        np.testing.assert_allclose(rate, 0.0, atol=1e-9)


class TestPandaDynamics:
    def test_panda_rnea_runs(self, data_dir):
        robot = RobotModel(
            urdf_filename=f"{data_dir}/robots/panda/panda.urdf", dtype=jnp.float64
        )
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.uniform(-1, 1, size=robot.ndof))
        qd = jnp.asarray(rng.uniform(-1, 1, size=robot.ndof))
        qdd = jnp.asarray(rng.uniform(-1, 1, size=robot.ndof))
        tau = np.asarray(robot.rnea(q, qd, qdd))
        assert tau.shape == (robot.ndof,)
        assert np.isfinite(tau).all()
        M = np.asarray(mass_matrix(robot, q))
        np.testing.assert_allclose(M, M.T, atol=1e-9)
        assert np.linalg.eigvalsh(M).min() > -1e-10
