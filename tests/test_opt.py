"""Solver tests: dense box-LM and block-tridiagonal trajectory LM against
scipy oracles and analytic solutions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.opt import (
    TrajectoryConfig,
    make_box_lm_solver,
    make_trajectory_solver,
)
from grasptrajopt_tpu.opt.lm import LMConfig
from grasptrajopt_tpu.opt.scipy_oracle import solve_scipy_box


class TestBoxLM:
    def test_linear_least_squares_exact(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(12, 4)))
        b = jnp.asarray(rng.normal(size=12))

        def res(x, p):
            return A @ x - b

        solve = make_box_lm_solver(res, config=LMConfig(iterations=20))
        lo = -10 * jnp.ones(4)
        hi = 10 * jnp.ones(4)
        x, c, _ = solve(jnp.zeros(4), lo, hi, None)
        want = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)

    def test_rosenbrock_residual_form(self):
        def res(x, p):
            return jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        solve = make_box_lm_solver(res, config=LMConfig(iterations=100))
        x, c, _ = solve(jnp.asarray([-1.2, 1.0]), -5 * jnp.ones(2), 5 * jnp.ones(2), None)
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-5)

    def test_active_box_constraint(self):
        # min (x-2)^2 with x <= 1 -> x = 1
        def res(x, p):
            return x - 2.0

        solve = make_box_lm_solver(res, config=LMConfig(iterations=30))
        x, c, _ = solve(jnp.zeros(1), -jnp.ones(1), jnp.ones(1), None)
        np.testing.assert_allclose(np.asarray(x), [1.0], atol=1e-7)

    def test_value_term_gradient_steering(self):
        # residual pulls x to 0; value term 4x pushes to lower bound side
        def res(x, p):
            return x

        def val(x, p):
            return 4.0 * jnp.sum(x)

        solve = make_box_lm_solver(res, value_fn=val, config=LMConfig(iterations=60))
        x, c, _ = solve(jnp.zeros(1), -5 * jnp.ones(1), 5 * jnp.ones(1), None)
        np.testing.assert_allclose(np.asarray(x), [-2.0], atol=1e-4)  # d/dx (x^2+4x)=0

    def test_matches_scipy_on_random_nlp(self):
        rng = np.random.default_rng(7)
        A = jnp.asarray(rng.normal(size=(8, 5)))
        b = jnp.asarray(rng.normal(size=8))

        def res(x, p):
            return A @ jnp.tanh(x) - b  # mildly nonlinear

        lo = -2 * np.ones(5)
        hi = 2 * np.ones(5)
        x0 = np.zeros(5)
        solve = make_box_lm_solver(res, config=LMConfig(iterations=100))
        x_lm, c_lm, _ = solve(jnp.asarray(x0), jnp.asarray(lo), jnp.asarray(hi), None)
        x_sp, c_sp = solve_scipy_box(res, x0, lo, hi, None)
        assert c_lm <= c_sp * 1.02 + 1e-8

    def test_vmap_batch(self):
        def res(x, p):
            return x - p

        solve = make_box_lm_solver(res, config=LMConfig(iterations=20))
        targets = jnp.asarray(np.random.default_rng(1).normal(size=(6, 3)))
        lo = -5 * jnp.ones(3)
        hi = 5 * jnp.ones(3)
        xs, cs, _ = jax.vmap(lambda t: solve(jnp.zeros(3), lo, hi, t))(targets)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(targets), atol=1e-6)


class TestTrajectoryLM:
    def test_smoothness_only_stays_at_qc(self):
        T, n = 10, 3
        cfg = TrajectoryConfig(T=T, smooth_weight=1.0, iterations=20)

        def res(q, t, aux, p):
            return jnp.zeros(1, q.dtype)

        solve = make_trajectory_solver(res, cfg)
        qc = jnp.asarray([0.3, -0.2, 0.5])
        X0 = jnp.tile(qc, (T - 2, 1)) + 0.1
        lo = -jnp.ones(n) * 5
        hi = jnp.ones(n) * 5
        Q, c, _ = solve(qc, X0, lo, hi, None)
        np.testing.assert_allclose(np.asarray(Q), np.tile(np.asarray(qc), (T, 1)), atol=1e-5)

    def test_terminal_target_matches_scipy(self):
        """End at a target with velocity regularization: compare to scipy on
        the identical reduced problem."""
        T, n = 12, 2
        w = 0.5
        target = jnp.asarray([1.0, -0.7])
        qc = jnp.zeros(2)

        def res(q, t, aux, p):
            is_last = (t == T - 1).astype(q.dtype)
            return is_last * (q - p["target"])

        cfg = TrajectoryConfig(T=T, smooth_weight=w, iterations=60)
        solve = make_trajectory_solver(res, cfg)
        lo, hi = -5 * jnp.ones(n), 5 * jnp.ones(n)
        X0 = jnp.zeros((T - 2, n))
        params = {"target": target}
        Q, c, _ = solve(qc, X0, lo, hi, params)

        def flat_res(xflat, p):
            X = xflat.reshape(T - 2, n)
            Q = jnp.concatenate([jnp.zeros((2, n)), X])
            r_goal = Q[-1] - p["target"]
            dq = (Q[1:] - Q[:-1]) * jnp.sqrt(w)
            return jnp.concatenate([r_goal, dq.reshape(-1)])

        x_sp, c_sp = solve_scipy_box(
            flat_res, np.zeros((T - 2) * n), -5 * np.ones((T - 2) * n), 5 * np.ones((T - 2) * n), params
        )
        np.testing.assert_allclose(c, c_sp, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(Q[2:]).reshape(-1), x_sp, atol=2e-3)

    def test_box_limits_respected(self):
        T, n = 8, 1
        cfg = TrajectoryConfig(T=T, smooth_weight=0.1, iterations=40)

        def res(q, t, aux, p):
            is_last = (t == T - 1).astype(q.dtype)
            return is_last * (q - 3.0)  # target beyond the limit

        solve = make_trajectory_solver(res, cfg)
        Q, c, _ = solve(jnp.zeros(1), jnp.zeros((T - 2, 1)), -jnp.ones(1), jnp.ones(1), None)
        assert np.asarray(Q).max() <= 1.0 + 1e-9
        np.testing.assert_allclose(np.asarray(Q[-1]), [1.0], atol=1e-4)

    def test_pre_iteration_goal_selection(self):
        """min over two goals: solver should converge to the nearer one."""
        T, n = 8, 2
        goals = jnp.asarray([[2.0, 2.0], [0.3, -0.2]])

        def pre(Q, p):
            d = jnp.sum((Q[-1][None, :] - p["goals"]) ** 2, axis=1)
            return jnp.argmin(d)

        def res(q, t, aux, p):
            is_last = (t == T - 1).astype(q.dtype)
            return is_last * (q - p["goals"][aux])

        cfg = TrajectoryConfig(T=T, smooth_weight=0.05, iterations=50)
        solve = make_trajectory_solver(res, cfg, pre_iteration=pre)
        Q, c, aux = solve(
            jnp.zeros(2), jnp.zeros((T - 2, 2)), -5 * jnp.ones(2), 5 * jnp.ones(2), {"goals": goals}
        )
        # smoothness slightly shrinks the terminal point toward qc=0
        np.testing.assert_allclose(np.asarray(Q[-1]), [0.3, -0.2], atol=5e-3)
        assert int(aux["step_aux"]) == 1

    def test_single_pass_matches_two_pass(self):
        """Delayed-gratification LM (single_pass=True) converges to the
        same solution as the default accept-test iteration."""
        T, n = 12, 2
        w = 0.5

        def res(q, t, aux, p):
            is_last = (t == T - 1).astype(q.dtype)
            return is_last * (q - p["target"])

        lo, hi = -5 * jnp.ones(n), 5 * jnp.ones(n)
        X0 = jnp.zeros((T - 2, n))
        params = {"target": jnp.asarray([1.0, -0.7])}
        cfg = TrajectoryConfig(T=T, smooth_weight=w, iterations=60)
        Q_a, c_a, _ = make_trajectory_solver(res, cfg)(jnp.zeros(2), X0, lo, hi, params)
        Q_b, c_b, _ = make_trajectory_solver(res, cfg._replace(single_pass=True))(
            jnp.zeros(2), X0, lo, hi, params
        )
        np.testing.assert_allclose(np.asarray(Q_b), np.asarray(Q_a), atol=1e-3)
        np.testing.assert_allclose(c_b, c_a, rtol=1e-3)

    def test_vmap_over_problems(self):
        T, n = 6, 2

        def res(q, t, aux, p):
            is_last = (t == T - 1).astype(q.dtype)
            return is_last * (q - p)

        cfg = TrajectoryConfig(T=T, smooth_weight=0.2, iterations=30)
        solve = make_trajectory_solver(res, cfg)
        targets = jnp.asarray(np.random.default_rng(2).normal(size=(5, 2)))
        lo, hi = -5 * jnp.ones(2), 5 * jnp.ones(2)
        Qs, cs, _ = jax.vmap(lambda tgt: solve(jnp.zeros(2), jnp.zeros((T - 2, 2)), lo, hi, tgt))(targets)
        assert Qs.shape == (5, T, 2)
        for b in range(5):
            Qb, cb, _ = solve(jnp.zeros(2), jnp.zeros((T - 2, 2)), lo, hi, targets[b])
            np.testing.assert_allclose(np.asarray(Qs[b]), np.asarray(Qb), atol=1e-6)
