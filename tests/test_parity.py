"""North-star acceptance test (BASELINE.md): the on-device trajectory
solver must match a SciPy reference solution of the SAME reduced problem
to within 1e-3 rad per joint, at full Panda problem size."""

import numpy as np
import pytest
from scipy import optimize

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.planning import GTOPlanner, GTORobotModel, IKSolver
from grasptrajopt_tpu.planning.utils import load_robot_config

PANDA_RT = np.array(
    [
        [-0.61162336, 0.79089652, 0.01998741, 0.46388378],
        [0.7883297, 0.6071185, 0.09971584, -0.15167381],
        [0.06673018, 0.07674521, -0.99481508, 0.22877409],
        [0.0, 0.0, 0.0, 1.0],
    ]
)
PANDA_DEFAULT = np.array([0.0, -1.285, 0, -2.356, 0.0, 1.571, 0.785, 0.0, 0.0])


@pytest.mark.slow
def test_trajectory_matches_scipy_reference(data_dir):
    """Solve the reference __main__ planning problem (goal point-match +
    standoff + velocity regularizer + joint limits, no obstacles) with
    (a) the on-device block-tridiagonal projected LM and (b) SciPy L-BFGS-B
    on the identical reduced unknowns, and compare trajectories."""
    cfg = load_robot_config("panda", data_dir)
    robot = GTORobotModel(
        model_dir=f"{data_dir}/robots/panda",
        urdf_filename=f"{data_dir}/robots/panda/panda.urdf",
        time_derivs=[0, 1],
        param_joints=cfg["param_joints"],
        collision_link_names=cfg["collision_link_names"],
        dtype=jnp.float64,
    )
    robot.setup_workspace_field(arm_len=cfg["arm_len"], arm_height=cfg["arm_height"])
    qc = PANDA_DEFAULT
    sdf_zero = np.zeros(robot.field_size)

    ik = IKSolver(robot, cfg["link_ee"], cfg["link_gripper"])
    ik.setup_optimization()
    q_sol, err_pos, *_ = ik.solve_ik(qc, PANDA_RT, sdf_zero, [0, 0, 0], verbose=False)
    assert err_pos < 0.01

    planner = GTOPlanner(
        robot, cfg["link_ee"], cfg["link_gripper"],
        collision_avoidance=False, iterations=100,
    )
    Q_dev, dQ, cost_dev = planner.plan(
        qc, PANDA_RT, sdf_zero, [0, 0, 0], q_sol,
        use_standoff=True, axis_standoff=cfg["axis_standoff"],
    )

    # -- identical reduced problem for scipy ---------------------------------
    T = planner.T
    n_opt = robot.num_opt_joints
    opt_idx = robot.optimized_joint_indexes
    qc_opt = qc[opt_idx]
    q_param = robot.extract_parameter_dimensions(jnp.asarray(qc, jnp.float64)[:, None])[:, 0]
    w = 0.01 / planner.dt**2
    gpts = jnp.asarray(robot.surface_pc_map[cfg["link_gripper"]].points, jnp.float64)
    ee_f = robot.frame_of(cfg["link_ee"])
    grip_f = robot.frame_of(cfg["link_gripper"])
    pose_standoff = np.eye(4)
    pose_standoff[{"x": 0, "y": 1, "z": 2}[cfg["axis_standoff"]], 3] = planner.standoff_distance
    RTj = jnp.asarray(PANDA_RT, jnp.float64)
    standoffj = jnp.asarray(pose_standoff, jnp.float64)

    from grasptrajopt_tpu.spatial import invt, transform_points

    def cost_flat(xflat):
        X = xflat.reshape(T - 2, n_opt)
        Q_opt = jnp.concatenate([jnp.tile(jnp.asarray(qc_opt)[None], (2, 1)), X])
        Qf = jax.vmap(lambda qo: robot.assemble_q(qo, q_param))(Q_opt)
        frames = robot.fk_all(Qf)

        def goal_cost(t, goal_tf):
            T_ee = frames[t, ee_f]
            T_g = frames[t, grip_f]
            gr = invt(T_ee) @ T_g
            cur = transform_points(T_g, gpts)
            tgt = transform_points(goal_tf @ gr, gpts)
            return jnp.sum((cur - tgt) ** 2)

        c = goal_cost(T - 1, RTj) + goal_cost(T - 10, RTj @ standoffj)
        dq = Q_opt[1:] - Q_opt[:-1]
        return c + w * jnp.sum(dq * dq)

    cost_jit = jax.jit(cost_flat)
    grad_jit = jax.jit(jax.grad(cost_flat))
    lo = np.tile(robot.lower_optimized_joint_limits, T - 2)
    hi = np.tile(robot.upper_optimized_joint_limits, T - 2)

    from grasptrajopt_tpu.planning.utils import interpolate_waypoints

    seed = interpolate_waypoints(np.stack([qc, q_sol]), T, robot.ndof)[:, opt_idx]
    x0 = seed[2:].reshape(-1)

    # the oracle must itself be converged tightly: at looser ftol/maxcor
    # L-BFGS-B stalls ~0.09 rad short in the flat valley of this problem
    res = optimize.minimize(
        lambda x: float(cost_jit(jnp.asarray(x))),
        x0,
        jac=lambda x: np.asarray(grad_jit(jnp.asarray(x)), dtype=float),
        bounds=list(zip(lo, hi)),
        method="L-BFGS-B",
        options={"maxiter": 2000, "ftol": 1e-16, "gtol": 1e-12, "maxcor": 50},
    )
    Q_scipy_opt = np.concatenate([np.tile(qc_opt[None], (2, 1)), res.x.reshape(T - 2, n_opt)])

    Q_dev_opt = np.asarray(Q_dev).T[:, opt_idx]  # (T, n_opt)
    max_dev = np.abs(Q_dev_opt - Q_scipy_opt).max()
    # BASELINE.md acceptance: trajectory match <= 1e-3 rad
    assert max_dev <= 1e-3, f"max joint deviation vs scipy reference: {max_dev:.2e} rad"
    # and our solver should reach at least the scipy cost
    assert float(cost_dev[0]) <= res.fun * (1 + 1e-5) + 1e-10
