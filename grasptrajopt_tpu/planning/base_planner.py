"""BasePlanner: mobile-base placement for a set of grasp goals.

Parity with /root/reference/gto/base_planner.py: one NLP over a base pose
(x, y, theta) — the reference's TaskModel('base_pose_estimator', dim=3)
(:23) — plus one arm configuration per goal. Cost: point-matching of the
gripper surface points at fk(q_i) (expressed in the candidate base frame)
against goals transformed by tf_base = rt2tr(rotz(theta), [x, y, 0])
(:43-86), plus an effort penalty w * ||(x,y,theta)||^2 (:58); theta bounded
to [-pi, pi] (:55) and arm joint limits (:89). Post-solve diagnostics
reproduce :129-163: per-goal pose errors and the 2-D occupancy collision
cost of the robot at the new base.

The whole problem is a single dense projected-LM solve (dimension
3 + n_opt * goals <= ~100), batchable over candidate grasp subsets via
vmap — the reference loops "solve until occupancy cost == 0" with fresh
Ipopt calls (pybullet_gto_planning_mobile.py:186-202); here every candidate
subset can be solved in one shot and the best picked.
"""

from __future__ import annotations



import numpy as np

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.opt.lm import LMConfig, make_box_lm_solver
from grasptrajopt_tpu.planning.utils import rotZ
from grasptrajopt_tpu.spatial import invt, r2quat, rotz, rt2tr, transform_points
from grasptrajopt_tpu.spatial.quaternion import qangle_deg


class BasePlanner:
    def __init__(self, robot, link_ee: str, link_gripper: str, iterations: int = 100):
        self.robot = robot
        self.robot_name = robot.get_name()
        self.link_ee = link_ee
        self.link_gripper = link_gripper
        self.iterations = iterations
        self.gripper_points = jnp.asarray(
            robot.surface_pc_map[link_gripper].points, robot.dtype
        )
        self.task_name = "base_pose_estimator"
        self._solver = None
        self._goal_size = None

    def setup_optimization(self, goal_size: int = 1, base_effort_weight: float = 0.01):
        robot = self.robot
        dtype = robot.dtype
        n_opt = robot.num_opt_joints
        ee_frame = robot.frame_of(self.link_ee)
        grip_frame = robot.frame_of(self.link_gripper)
        gpts = self.gripper_points
        sqrt_w = jnp.asarray(np.sqrt(base_effort_weight), dtype)

        def unpack(x):
            base = x[:3]
            Q_opt = x[3:].reshape(goal_size, n_opt)
            return base, Q_opt

        def residual(x, params):
            base, Q_opt = unpack(x)
            tf_base = rt2tr(rotz(base[2]), jnp.stack([base[0], base[1], jnp.zeros((), dtype)]))

            def goal_res(q_opt, tf_goal_one):
                q_full = robot.assemble_q(q_opt, params["q_param"])
                frames = robot.fk_all(q_full)
                T_grip = frames[grip_frame]
                gripper_tf = invt(frames[ee_frame]) @ T_grip
                pts_cur = transform_points(T_grip, gpts)
                pts_goal = transform_points(tf_base @ tf_goal_one @ gripper_tf, gpts)
                return (pts_cur - pts_goal).reshape(-1)

            goal_part = jax.vmap(goal_res)(Q_opt, params["tf_goal"]).reshape(-1)
            effort = sqrt_w * base
            return jnp.concatenate([goal_part, effort])

        solver = make_box_lm_solver(residual, config=LMConfig(iterations=self.iterations))

        big = jnp.asarray(1e9, dtype)
        lo = jnp.concatenate(
            [
                jnp.asarray([-big, -big, -jnp.pi], dtype),
                jnp.tile(jnp.asarray(robot.lower_optimized_joint_limits, dtype), goal_size),
            ]
        )
        hi = jnp.concatenate(
            [
                jnp.asarray([big, big, jnp.pi], dtype),
                jnp.tile(jnp.asarray(robot.upper_optimized_joint_limits, dtype), goal_size),
            ]
        )

        def run(x0, params):
            return solver(x0, lo, hi, params)

        self._solver = jax.jit(run)
        self._solver_batch = jax.jit(jax.vmap(run))
        self._goal_size = goal_size

    def plan_goalset(self, qc, RTs, verbose: bool = True):
        """Solve base placement for goal poses RTs (n, 4, 4) given current
        config qc. Returns (Q (ndof, n), y (3,), err_pos (n,), err_rot (n,),
        occupancy collision cost). Parity: base_planner.py:96-168."""
        robot = self.robot
        dtype = robot.dtype
        RTs = jnp.asarray(RTs, dtype)
        n = RTs.shape[0]
        if self._goal_size != n:
            self.setup_optimization(goal_size=n)

        qc = jnp.asarray(qc, dtype).reshape(-1)
        q_param = robot.extract_parameter_dimensions(qc[:, None])[:, 0]
        qc_opt = robot.extract_optimized_dimensions(qc[:, None])[:, 0]
        x0 = jnp.concatenate([jnp.zeros(3, dtype), jnp.tile(qc_opt, n)])
        params = {"tf_goal": RTs, "q_param": q_param}

        x, cost, _ = self._solver(x0, params)
        y = np.asarray(x[:3], dtype=np.float64)
        Q_opt = x[3:].reshape(n, robot.num_opt_joints)
        Q_full = jax.vmap(lambda qo: robot.assemble_q(qo, q_param))(Q_opt)  # (n, ndof)

        # -- diagnostics (parity: :129-163) -----------------------------------
        RT_base = rotZ(y[2])
        RT_base[0, 3] = y[0]
        RT_base[1, 3] = y[1]
        RT_base_j = jnp.asarray(RT_base, dtype)

        frames = robot.fk_all(Q_full)
        T_grip = frames[:, robot.frame_of(self.link_gripper)]
        T_ee = frames[:, robot.frame_of(self.link_ee)]
        gripper_tf = invt(T_ee) @ T_grip
        RT_goal = RT_base_j @ RTs @ gripper_tf
        err_pos = np.asarray(jnp.linalg.norm(RT_goal[:, :3, 3] - T_grip[:, :3, 3], axis=-1))
        err_rot = np.asarray(
            qangle_deg(r2quat(RT_goal[:, :3, :3]), r2quat(T_grip[:, :3, :3]))
        )

        col_cost = 0.0
        if getattr(robot, "occupancy", None) is not None and robot.occupancy_grid is not None:
            RT_base_inv = jnp.asarray(np.linalg.inv(RT_base), dtype)
            cost_val = robot.occupancy_cost(qc, RT_base_inv, robot.occupancy_grid)
            col_cost = float(cost_val)

        if verbose:
            for i in range(n):
                print(f"grasp {i}: position error {err_pos[i]:.4f}, rotation error {err_rot[i]:.2f} deg")
            print("base pose solution:", y)
            print("collision cost", col_cost)
        return np.asarray(Q_full).T, y, err_pos, err_rot, col_cost
