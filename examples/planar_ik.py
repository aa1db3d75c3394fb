"""Minimal IK demo: solve a planar 3-DoF reach with the on-device LM solver
and cross-check against SciPy SLSQP — runnable with zero external data.

This mirrors the reference's oracle pattern (examples/planar_ik.py:51-68,
which solves the same NLP with CasADi/Ipopt and SciPy/SLSQP and compares).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.models import RobotModel
from grasptrajopt_tpu.opt import make_box_lm_solver
from grasptrajopt_tpu.opt.lm import LMConfig
from grasptrajopt_tpu.opt.scipy_oracle import solve_scipy_box

PLANAR_3DOF = """
<robot name="planar_3dof">
  <link name="base"/><link name="l1"/><link name="l2"/><link name="ee"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/><origin xyz="0 0 0"/>
    <axis xyz="0 0 1"/><limit lower="-3.14" upper="3.14" velocity="1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/><origin xyz="1 0 0"/>
    <axis xyz="0 0 1"/><limit lower="-3.14" upper="3.14" velocity="1"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="ee"/><origin xyz="1 0 0"/>
    <axis xyz="0 0 1"/><limit lower="-3.14" upper="3.14" velocity="1"/>
  </joint>
</robot>
"""


def main():
    robot = RobotModel(urdf_string=PLANAR_3DOF, dtype=jnp.float64)
    target = jnp.asarray([1.2, 0.9, 0.0])

    def residual(q, p):
        # ee position is at l2 frame + 0 (ee has no offset): use fk of 'ee'
        pos = robot.get_global_link_position("ee", q)
        return pos - p

    solve = make_box_lm_solver(residual, config=LMConfig(iterations=50))
    lo = -3.14 * jnp.ones(3)
    hi = 3.14 * jnp.ones(3)
    q_lm, c_lm, _ = solve(jnp.asarray([0.1, 0.1, 0.1]), lo, hi, target)
    q_sp, c_sp = solve_scipy_box(
        residual, np.array([0.1, 0.1, 0.1]), np.asarray(lo), np.asarray(hi), target
    )

    print("LM solution:   ", np.asarray(q_lm), "cost", float(c_lm))
    print("SLSQP solution:", q_sp, "cost", c_sp)
    pos = np.asarray(robot.get_global_link_position("ee", q_lm))
    print("reached:", pos, "target:", np.asarray(target))
    assert np.linalg.norm(pos - np.asarray(target)) < 1e-4


if __name__ == "__main__":
    main()
