"""Builder DSL + general solver tests: block layout ABI, problem
classification, AL-SQP vs scipy oracle, ADMM QP vs analytic solutions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.models import RobotModel, TaskModel
from grasptrajopt_tpu.opt import (
    ADMMQPSolver,
    ALSQPConfig,
    ALSQPSolver,
    BlockLayout,
    OptimizationBuilder,
    ScipyMinimizeSolver,
    make_al_sqp_solver,
    solve_qp_admm,
)

TWO_LINK = """
<robot name="two_link">
  <link name="base"/><link name="upper"/><link name="ee"/>
  <joint name="shoulder" type="revolute">
    <parent link="base"/><child link="upper"/><origin xyz="0 0 0"/>
    <axis xyz="0 0 1"/><limit lower="-2" upper="2" velocity="1.5"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/><child link="ee"/><origin xyz="1 0 0"/>
    <axis xyz="0 0 1"/><limit lower="-2.5" upper="2.5" velocity="2.5"/>
  </joint>
</robot>
"""


class TestBlockLayout:
    def test_vec_unvec_roundtrip_column_major(self):
        layout = BlockLayout()
        layout.add("a", 2, 3)
        layout.add("b", 4)
        a = jnp.arange(6.0).reshape(2, 3)
        b = jnp.arange(4.0)
        v = layout.vec({"a": a, "b": b}, jnp.float64)
        assert v.shape == (10,)
        # column-major: first column of a first
        np.testing.assert_allclose(np.asarray(v[:2]), [0, 3])
        back = layout.unvec(v)
        np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(a))
        np.testing.assert_allclose(np.asarray(back["b"]).reshape(-1), np.asarray(b))

    def test_missing_blocks_zero(self):
        layout = BlockLayout()
        layout.add("a", 2)
        layout.add("b", 2)
        v = layout.vec({"a": jnp.ones(2)}, jnp.float64)
        np.testing.assert_allclose(np.asarray(v), [1, 1, 0, 0])


class TestBuilderAllocation:
    def test_robot_block_allocation(self):
        robot = RobotModel(urdf_string=TWO_LINK, time_derivs=[0, 1], dtype=jnp.float64)
        b = OptimizationBuilder(T=10, robots=[robot])
        assert "two_link/q/x" in b.x_layout
        assert "two_link/dq/x" in b.x_layout
        assert b.x_layout.shapes["two_link/q/x"] == (2, 10)
        assert b.x_layout.shapes["two_link/dq/x"] == (2, 9)

    def test_param_joint_split(self):
        robot = RobotModel(
            urdf_string=TWO_LINK, time_derivs=[0], param_joints=["elbow"], dtype=jnp.float64
        )
        b = OptimizationBuilder(T=5, robots=[robot])
        assert b.x_layout.shapes["two_link/q/x"] == (1, 5)
        assert b.p_layout.shapes["two_link/q/p"] == (1, 5)

    def test_task_model(self):
        task = TaskModel("base_pose", dim=3)
        b = OptimizationBuilder(T=4, tasks=[task])
        assert b.x_layout.shapes["base_pose/y/x"] == (3, 4)


class TestDiscreteVariables:
    """MINLP slot (parity surface: optimization.py:308-309, :533;
    sx_container.py is_discrete flags; builder.py:248-261)."""

    def _build(self):
        task = TaskModel("slot", dim=2, is_discrete=True)
        b = OptimizationBuilder(T=1, tasks=[task])
        b.add_decision_variables("shift", 1, is_discrete=False)
        target = np.array([2.3, -0.6])
        b.add_cost_term(
            "fit",
            lambda x, p: jnp.sum((x["slot/y/x"].reshape(-1) - target) ** 2)
            + (x["shift"].reshape(()) - 0.25) ** 2,
        )
        return b.build()

    def test_layout_and_classification(self):
        opt = self._build()
        assert opt.has_discrete_variables
        mask = opt.discrete_mask()
        assert mask.sum() == 2 and mask.size == 3
        assert opt.problem_class.startswith("MixedInteger")
        # continuous-only problems keep the plain class names
        b2 = OptimizationBuilder(T=1, tasks=[TaskModel("y", dim=1)])
        b2.add_cost_term("c", lambda x, p: jnp.sum(x["y/y/x"] ** 2))
        assert not b2.build().has_discrete_variables
        assert "MixedInteger" not in b2.build().problem_class

    def test_alsqp_relax_round_polish(self):
        opt = self._build()
        solver = ALSQPSolver(opt).setup()
        sol = solver.solve()
        slot = np.asarray(sol["slot/y/x"]).reshape(-1)
        # discrete coords land exactly on integers, at the nearest ones
        np.testing.assert_allclose(slot, [2.0, -1.0], atol=1e-8)
        # the continuous coordinate is polished to its own optimum
        np.testing.assert_allclose(float(np.asarray(sol["shift"]).reshape(())), 0.25, atol=1e-6)


class TestProblemClassification:
    def test_quadratic_linear(self):
        b = OptimizationBuilder(T=1)
        b.add_decision_variables("x", 3)
        b.add_parameter("target", 3)
        b.add_cost_term("quad", lambda x, p: jnp.sum((x["x"] - p["target"]) ** 2))
        b.add_equality_constraint("sum1", lambda x, p: jnp.sum(x["x"]) - 1.0)
        opt = b.build()
        assert opt.cost_is_quadratic()
        assert opt.constraints_are_linear()
        assert opt.problem_class == "QuadraticCostLinearConstraints"

    def test_nonlinear(self):
        b = OptimizationBuilder(T=1)
        b.add_decision_variables("x", 2)
        b.add_cost_term("nl", lambda x, p: jnp.sum(jnp.sin(x["x"])))
        b.add_geq_inequality_constraint("circle", lambda x, p: 1.0 - jnp.sum(x["x"] ** 2))
        opt = b.build()
        assert opt.problem_class == "NonlinearCostNonlinearConstraints"


class TestALSQP:
    def test_equality_constrained_quadratic(self):
        # min ||x||^2 s.t. x0 + x1 = 1 -> x = [0.5, 0.5]
        solve = make_al_sqp_solver(
            f=lambda x, p: jnp.sum(x * x),
            h=lambda x, p: jnp.asarray([x[0] + x[1] - 1.0]),
        )
        x, info = jax.jit(solve)(
            jnp.zeros(2, jnp.float64), -jnp.full(2, jnp.inf), jnp.full(2, jnp.inf), jnp.zeros(0)
        )
        np.testing.assert_allclose(np.asarray(x), [0.5, 0.5], atol=1e-6)
        assert float(info["constraint_violation"]) < 1e-6

    def test_inequality_active(self):
        # min (x-2)^2 s.t. x <= 1 (g = 1 - x >= 0)
        solve = make_al_sqp_solver(
            f=lambda x, p: jnp.sum((x - 2.0) ** 2),
            g=lambda x, p: 1.0 - x,
        )
        x, info = solve(
            jnp.zeros(1, jnp.float64), -jnp.full(1, jnp.inf), jnp.full(1, jnp.inf), jnp.zeros(0)
        )
        np.testing.assert_allclose(np.asarray(x), [1.0], atol=1e-5)

    def test_matches_scipy_on_nlp(self):
        # min sum(sin(x)) + ||x||^2 s.t. sum(x^2) <= 2
        def f(x, p):
            return jnp.sum(jnp.sin(x)) + jnp.sum(x * x)

        def g(x, p):
            return jnp.asarray([2.0 - jnp.sum(x * x)])

        solve = make_al_sqp_solver(f=f, g=g, config=ALSQPConfig(outer_iterations=12, inner_iterations=25))
        x, _ = solve(
            jnp.full(3, 0.5, jnp.float64), -jnp.full(3, jnp.inf), jnp.full(3, jnp.inf), jnp.zeros(0)
        )
        from scipy.optimize import minimize

        res = minimize(
            lambda xx: float(f(jnp.asarray(xx), None)),
            np.full(3, 0.5),
            constraints=[{"type": "ineq", "fun": lambda xx: float(g(jnp.asarray(xx), None)[0])}],
            method="SLSQP",
        )
        assert float(f(x, None)) <= res.fun + 1e-6 * abs(res.fun) + 1e-8


class TestADMMQP:
    def test_box_qp(self):
        # min 1/2 x^T I x - [3,3]^T x s.t. 0 <= x <= 1 -> x = [1, 1]
        P = jnp.eye(2, dtype=jnp.float64)
        q = jnp.asarray([-3.0, -3.0])
        A = jnp.eye(2, dtype=jnp.float64)
        x, z, y, res = solve_qp_admm(P, q, A, jnp.zeros(2), jnp.ones(2))
        np.testing.assert_allclose(np.asarray(x), [1, 1], atol=1e-4)

    def test_equality_qp_analytic(self):
        # min 1/2 x^T P x + q^T x s.t. a^T x = b — compare to KKT solution
        rng = np.random.default_rng(0)
        M = rng.normal(size=(3, 3))
        P = jnp.asarray(M @ M.T + 3 * np.eye(3))
        q = jnp.asarray(rng.normal(size=3))
        a = rng.normal(size=3)
        A = jnp.asarray(a[None, :])
        b = 1.3
        x, *_ = solve_qp_admm(P, q, A, jnp.asarray([b]), jnp.asarray([b]))
        KKT = np.block([[np.asarray(P), a[:, None]], [a[None, :], np.zeros((1, 1))]])
        sol = np.linalg.solve(KKT, np.concatenate([-np.asarray(q), [b]]))
        np.testing.assert_allclose(np.asarray(x), sol[:3], atol=1e-4)

    def test_vmap_batch(self):
        P = jnp.tile(jnp.eye(2, dtype=jnp.float64)[None], (4, 1, 1))
        qs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 2)))
        A = jnp.tile(jnp.eye(2, dtype=jnp.float64)[None], (4, 1, 1))
        l = jnp.full((4, 2), -10.0)
        u = jnp.full((4, 2), 10.0)
        xs, *_ = jax.vmap(lambda p_, q_, a_, l_, u_: solve_qp_admm(p_, q_, a_, l_, u_))(P, qs, A, l, u)
        np.testing.assert_allclose(np.asarray(xs), -np.asarray(qs), atol=1e-5)


class TestSolverInterface:
    def _toy_problem(self):
        b = OptimizationBuilder(T=1)
        b.add_decision_variables("x", 2)
        b.add_parameter("target", 2)
        b.add_cost_term("track", lambda x, p: jnp.sum((x["x"] - p["target"]) ** 2))
        b.add_equality_constraint("fix0", lambda x, p: x["x"][0, 0] - 0.25)
        return b.build()

    def test_alsqp_solver_named_api(self):
        opt = self._toy_problem()
        solver = ALSQPSolver(opt).setup()
        solver.reset_parameters({"target": np.array([1.0, 2.0])})
        solver.reset_initial_seed({"x": np.zeros(2)})
        sol = solver.solve()
        np.testing.assert_allclose(sol["x"].reshape(-1), [0.25, 2.0], atol=1e-5)
        assert solver.did_solve()
        assert solver.violated_constraints() == {}
        terms = solver.evaluate_cost_terms()
        assert "track" in terms

    def test_scipy_solver_matches(self):
        opt = self._toy_problem()
        s1 = ALSQPSolver(opt).setup()
        s2 = ScipyMinimizeSolver(opt).setup()
        for s in (s1, s2):
            s.reset_parameters({"target": np.array([1.0, 2.0])})
        sol1 = s1.solve()
        sol2 = s2.solve()
        np.testing.assert_allclose(sol1["x"], sol2["x"], atol=1e-5)

    def test_qp_solver_on_quadratic(self):
        opt = self._toy_problem()
        solver = ADMMQPSolver(opt).setup()
        solver.reset_parameters({"target": np.array([1.0, 2.0])})
        sol = solver.solve()
        np.testing.assert_allclose(sol["x"].reshape(-1), [0.25, 2.0], atol=1e-4)

    def test_robot_problem_param_joint_merge(self):
        robot = RobotModel(
            urdf_string=TWO_LINK, time_derivs=[0], param_joints=["elbow"], dtype=jnp.float64
        )
        b = OptimizationBuilder(T=3, robots=[robot])
        b.add_parameter("target", 1)
        b.add_cost_term(
            "goal",
            lambda x, p: jnp.sum((x["two_link/q/x"][:, -1] - p["target"]) ** 2),
        )
        b.enforce_model_limits("two_link")
        opt = b.build()
        solver = ALSQPSolver(opt).setup()
        solver.reset_parameters(
            {"target": np.array([0.7]), "two_link/q/p": 0.3 * np.ones((1, 3))}
        )
        sol = solver.solve()
        # merged full-q output: optimized row reaches target, param row = 0.3
        assert sol["two_link/q"].shape == (2, 3)
        np.testing.assert_allclose(sol["two_link/q"][0, -1], 0.7, atol=1e-4)
        np.testing.assert_allclose(sol["two_link/q"][1], 0.3, atol=0)

    def test_violated_constraints_reports(self):
        opt = self._toy_problem()
        solver = ALSQPSolver(opt).setup()
        solver.reset_parameters({"target": np.array([1.0, 2.0])})
        # probe an infeasible point
        viol = solver.violated_constraints(xvec=jnp.zeros(2, jnp.float64))
        assert "fix0" in viol
