"""Builder DSL -> AL-SQP at full trajectory-NLP scale.

The reference's user-facing path is: express the T=50 grasp trajectory
problem through the OptimizationBuilder and hand it to a general NLP
backend (optas/builder.py:546-636 dispatch -> CasADiSolver/Ipopt,
gto/gto_planner.py:42-142). The shipped planners here bypass the DSL by
design (structural constraint elimination, opt/trajectory.py); this test
proves the general path is not toy-only: the SAME full-size panda-class
problem (T=50, 7 optimized joints, 693 decision variables, Euler equality
coupling, joint limits, goal point-match + trilinear-SDF obstacle +
velocity costs) built through the DSL

  (a) evaluates to the structured solver's exact cost at the structured
      solver's solution (formulation parity), and
  (b) solves on-device with ALSQPSolver to feasibility (Euler/initial
      constraints satisfied) at a cost no worse than the structured
      solver's optimum (the landscape is nonconvex; the two may pick
      different basins).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from grasptrajopt_tpu.opt import ALSQPConfig, ALSQPSolver, OptimizationBuilder
from grasptrajopt_tpu.planning.gto_planner import GTOPlanner
from grasptrajopt_tpu.spatial import invt, transform_points
from grasptrajopt_tpu.testing import (
    SYNTH_DEFAULT_POSE,
    SYNTH_LINK_EE,
    SYNTH_LINK_GRIPPER,
    make_synthetic_goal,
    make_synthetic_gto_robot,
    make_synthetic_scene_field,
)

T = 50
T_STANDOFF = T - 10
DT = 10.0 / (T - 1)


@pytest.fixture(scope="module")
def problem():
    robot = make_synthetic_gto_robot(dtype=jnp.float64, points_per_link=10)
    field = make_synthetic_scene_field(robot)
    tf_goal = jnp.asarray(make_synthetic_goal(0), jnp.float64)
    qc = np.asarray(SYNTH_DEFAULT_POSE, np.float64)
    qc_opt = jnp.asarray(qc[np.asarray(robot.optimized_joint_indexes)])
    q_param = jnp.asarray(qc[np.asarray(robot.parameter_joint_indexes)])
    return robot, field, tf_goal, qc_opt, q_param


def build_dsl_problem(robot, field, tf_goal):
    """The T=50 grasp trajectory NLP expressed through the builder DSL."""
    name = robot.get_name()
    builder = OptimizationBuilder(T=T, robots=[robot])
    gpts = jnp.asarray(robot.surface_pc_map[SYNTH_LINK_GRIPPER].points, jnp.float64)
    ee_frame = robot.frame_of(SYNTH_LINK_EE)
    grip_frame = robot.frame_of(SYNTH_LINK_GRIPPER)
    pose_standoff = np.eye(4)
    pose_standoff[2, 3] = -0.1  # GTOPlanner default standoff along z
    pose_standoff = jnp.asarray(pose_standoff)
    grid = robot.grid
    field_j = jnp.asarray(field, jnp.float64)

    def goal_cost(x, p):
        Q = builder.get_robot_states_and_parameters(x, p, name)  # (ndof, T)

        def diffs(q_full, tf):
            frames = robot.fk_all(q_full)
            gripper_tf = invt(frames[ee_frame]) @ frames[grip_frame]
            pts_cur = transform_points(frames[grip_frame], gpts)
            return pts_cur - transform_points(tf @ gripper_tf, gpts)

        d_final = diffs(Q[:, T - 1], tf_goal)
        d_stand = diffs(Q[:, T_STANDOFF], tf_goal @ pose_standoff)
        return jnp.sum(d_final**2) + jnp.sum(d_stand**2)

    def obstacle_cost(x, p):
        Q = builder.get_robot_states_and_parameters(x, p, name)
        pts = robot.fk_surface_points(Q.T)  # (T, P, 3)
        return 10.0 * jnp.sum(grid.lookup(field_j, pts, "trilinear") ** 2)

    def velocity_cost(x, p):
        dq = x[robot.state_optimized_name(1)]
        return 0.01 * jnp.sum(dq * dq)

    builder.add_cost_term("goal", goal_cost)
    builder.add_cost_term("obstacle", obstacle_cost)
    builder.add_cost_term("velocity", velocity_cost)
    return builder


@pytest.mark.slow
def test_builder_trajectory_nlp_full_scale(problem):
    robot, field, tf_goal, qc_opt, q_param = problem
    name = robot.get_name()
    n_opt = robot.num_opt_joints

    # structured solver reference
    planner = GTOPlanner(robot, SYNTH_LINK_EE, SYNTH_LINK_GRIPPER, iterations=80)
    solve_one = planner.setup_optimization(1, True, "z").solve_one
    params = {
        "q_param": q_param,
        "tf_goal": tf_goal[None],
        "goal_mask": jnp.ones(1, bool),
        "base_position": jnp.zeros(3, jnp.float64),
        "sdf_cost_all": jnp.asarray(field, jnp.float64),
        "sdf_cost_obstacle": jnp.asarray(field, jnp.float64),
    }
    Q_ref, c_ref, _ = solve_one(qc_opt, jnp.tile(qc_opt, (T - 2, 1)), params)

    builder = build_dsl_problem(robot, field, tf_goal)
    builder.initial_configuration(name, np.asarray(qc_opt))
    builder.initial_configuration(name, np.zeros(n_opt), time_deriv=1)
    builder.integrate_model_states(name, 1, DT)
    builder.enforce_model_limits(name, 0)
    opt = builder.build()
    assert opt.nx == n_opt * T + n_opt * (T - 1)  # 693 decision variables

    lo = np.concatenate(
        [np.tile(np.asarray(robot.lower_optimized_joint_limits), T),
         np.full(n_opt * (T - 1), -np.inf)]
    )
    hi = np.concatenate(
        [np.tile(np.asarray(robot.upper_optimized_joint_limits), T),
         np.full(n_opt * (T - 1), np.inf)]
    )
    solver = ALSQPSolver(opt).setup(
        lo, hi, ALSQPConfig(outer_iterations=8, inner_iterations=12)
    )
    solver.reset_initial_seed(
        {robot.state_optimized_name(0): np.tile(np.asarray(qc_opt)[:, None], (1, T)),
         robot.state_optimized_name(1): np.zeros((n_opt, T - 1))}
    )
    solver.reset_parameters(
        {robot.state_parameter_name(0): np.tile(np.asarray(q_param)[:, None], (1, T)),
         robot.state_parameter_name(1): np.zeros((robot.num_param_joints, T - 1))}
    )

    # (a) formulation parity: the DSL cost at the structured solution equals
    # the structured solver's reported cost (the smooth term + residual
    # sum-of-squares re-expressed through builder cost terms)
    q_blocks = np.asarray(
        robot.assemble_q(Q_ref, jnp.tile(q_param, (T, 1)))
    ).T[np.asarray(robot.optimized_joint_indexes)]
    dq_blocks = (q_blocks[:, 1:] - q_blocks[:, :-1]) / DT
    x_ref = opt.x_layout.vec(
        {robot.state_optimized_name(0): jnp.asarray(q_blocks),
         robot.state_optimized_name(1): jnp.asarray(dq_blocks)},
        jnp.float64,
    )
    np.testing.assert_allclose(float(opt.f(x_ref, solver._p)), float(c_ref), rtol=1e-6)

    # (b) the general on-device AL path solves to feasibility at a cost no
    # worse than the structured optimum
    sol = solver.solve()
    assert solver.stats()["constraint_violation"] < 1e-4
    assert solver.violated_constraints(tol=1e-4) == {}
    assert sol["f"] <= 1.05 * float(c_ref)
    Q_b = sol[f"{name}/q"]
    np.testing.assert_allclose(Q_b[:7, 0], np.asarray(qc_opt), atol=1e-4)
    assert (Q_b[:7].min(axis=1) >= np.asarray(robot.lower_optimized_joint_limits) - 1e-6).all()
    assert (Q_b[:7].max(axis=1) <= np.asarray(robot.upper_optimized_joint_limits) + 1e-6).all()
