"""Batch-path equivalence tests: per-problem vs shared-scene batches, and
the fully batched plan entry point."""

import numpy as np
import pytest

import jax.numpy as jnp

from grasptrajopt_tpu.planning.gto_planner import GTOPlanner
from grasptrajopt_tpu.testing import (
    SYNTH_DEFAULT_POSE,
    SYNTH_LINK_EE,
    SYNTH_LINK_GRIPPER,
    make_synthetic_goal,
    make_synthetic_gto_robot,
    make_synthetic_scene_field,
)


@pytest.fixture(scope="module")
def setup():
    robot = make_synthetic_gto_robot(points_per_link=20)
    planner = GTOPlanner(robot, SYNTH_LINK_EE, SYNTH_LINK_GRIPPER, iterations=8)
    solve_one, solve_batch, solve_batch_shared = planner.setup_optimization(
        goal_size=2, use_standoff=True, axis_standoff="z"
    )
    return robot, planner, solve_one, solve_batch, solve_batch_shared


def make_batch(robot, planner, B):
    rng = np.random.default_rng(0)
    qc = np.tile(SYNTH_DEFAULT_POSE, (B, 1)).astype(np.float32)
    qc_opt = qc[:, :7]
    X0 = np.tile(qc_opt[:, None, :], (1, planner.T - 2, 1))
    tf_goal = np.stack(
        [np.stack([make_synthetic_goal(b * 2 + g) for g in range(2)]) for b in range(B)]
    ).astype(np.float32)
    field = make_synthetic_scene_field(robot)
    per = {
        "q_param": jnp.asarray(qc[:, 7:]),
        "tf_goal": jnp.asarray(tf_goal),
        "goal_mask": jnp.ones((B, 2), bool),
        "base_position": jnp.zeros((B, 3), jnp.float32),
    }
    shared = {
        "sdf_cost_all": jnp.asarray(field),
        "sdf_cost_obstacle": jnp.asarray(field),
    }
    return jnp.asarray(qc_opt), jnp.asarray(X0), per, shared


class TestSharedSceneEquivalence:
    def test_shared_equals_broadcast(self, setup):
        robot, planner, solve_one, solve_batch, solve_batch_shared = setup
        B = 3
        qc_opt, X0, per, shared = make_batch(robot, planner, B)

        full = dict(per)
        for k, v in shared.items():
            full[k] = jnp.broadcast_to(v, (B,) + v.shape)
        Q_a, c_a, _ = solve_batch(qc_opt, X0, full)
        Q_b, c_b, _ = solve_batch_shared(qc_opt, X0, per, shared)
        np.testing.assert_allclose(np.asarray(Q_a), np.asarray(Q_b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b), atol=1e-6)

    def test_batch_matches_single(self, setup):
        robot, planner, solve_one, solve_batch, solve_batch_shared = setup
        B = 3
        qc_opt, X0, per, shared = make_batch(robot, planner, B)
        Q_b, c_b, _ = solve_batch_shared(qc_opt, X0, per, shared)
        for b in range(B):
            params_b = {k: v[b] for k, v in per.items()}
            params_b.update(shared)
            Q_1, c_1, _ = solve_one(qc_opt[b], X0[b], params_b)
            np.testing.assert_allclose(np.asarray(Q_b[b]), np.asarray(Q_1), atol=1e-5)

    def test_plan_goalset_batch_api(self, setup):
        robot, planner, *_ = setup
        B = 2
        qc = jnp.asarray(np.tile(SYNTH_DEFAULT_POSE, (B, 1)), jnp.float32)
        tf_goal = jnp.asarray(
            np.stack(
                [np.stack([make_synthetic_goal(b * 2 + g) for g in range(2)]) for b in range(B)]
            ),
            jnp.float32,
        )
        field = jnp.asarray(np.tile(make_synthetic_scene_field(robot), (B, 1)))
        Q0 = jnp.tile(qc[:, None, :], (1, planner.T, 1))
        Q, cost = planner.plan_goalset_batch(
            qc, tf_goal, jnp.ones((B, 2), bool), field, field,
            jnp.zeros((B, 3), jnp.float32), Q0,
            use_standoff=True, axis_standoff="z",
        )
        assert Q.shape == (B, planner.T, robot.ndof)
        assert np.isfinite(np.asarray(cost)).all()
        # param fingers pinned
        np.testing.assert_allclose(
            np.asarray(Q[..., 7:]), np.asarray(qc[:, None, 7:]) * np.ones((1, planner.T, 1)),
            atol=1e-6,
        )
