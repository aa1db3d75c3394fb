"""Solver interfaces over built Optimization problems.

Parity with the reference's solver layer (/root/reference/optas/solver.py):
the abstract Solver carries named-seed/parameter state via the block-layout
ABI (reset_initial_seed/reset_parameters :103-116), returns named solution
dicts with param joints re-merged into full `{name}/q` arrays (:126-159),
and offers the diagnostics the reference treats as test fixtures:
violated_constraints (:169-239), interpolate (:241-253),
evaluate_cost/evaluate_cost_terms (:271-316), stats/did_solve (:402-421).

Concrete backends:
  ALSQPSolver  — on-device augmented-Lagrangian NLP (CasADi/Ipopt slot)
  ADMMQPSolver — on-device ADMM for quadratic problems (OSQP/CVXOPT slot)
  ScipyMinimizeSolver — host oracle (the reference ships the same backend)
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy import interpolate as sci_interp
from scipy import optimize as sci_opt

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.models.robot import RobotModel
from grasptrajopt_tpu.opt.al_sqp import ALSQPConfig, make_al_sqp_solver
from grasptrajopt_tpu.opt.qp import ADMMConfig, solve_qp_admm
from grasptrajopt_tpu.opt.taxonomy import Optimization


class Solver:
    def __init__(self, optimization: Optimization, error_on_fail: bool = False):
        self.opt = optimization
        self.error_on_fail = error_on_fail
        self._x0 = jnp.zeros(optimization.nx, jnp.float64)
        self._p = jnp.zeros(optimization.np_, jnp.float64)
        self._stats: Dict = {}

    # -- seeding / parameters (block-dict ABI) --------------------------------

    def reset_initial_seed(self, values: Dict) -> None:
        full = self.opt.x_layout.unvec(self._x0)
        for k, v in values.items():
            full[k] = jnp.asarray(v, jnp.float64).reshape(self.opt.x_layout.shapes[k])
        self._x0 = self.opt.x_layout.vec(full, jnp.float64)

    def reset_parameters(self, values: Dict) -> None:
        full = self.opt.p_layout.unvec(self._p)
        for k, v in values.items():
            full[k] = jnp.asarray(v, jnp.float64).reshape(self.opt.p_layout.shapes[k])
        self._p = self.opt.p_layout.vec(full, jnp.float64)

    # -- solve ----------------------------------------------------------------

    def _solve_vec(self):
        raise NotImplementedError

    def solve(self) -> Dict:
        xvec = self._solve_vec()
        solution = {k: np.asarray(v) for k, v in self.opt.x_layout.unvec(xvec).items()}
        pdict = self.opt.p_layout.unvec(self._p)
        # re-merge param joints into the full `{name}/q` trajectories
        # (parity: solver.py:138-157)
        for model in self.opt.models:
            if not isinstance(model, RobotModel):
                for d in getattr(model, "time_derivs", []):
                    key = model.state_optimized_name(d)
                    solution[model.state_name(d)] = solution[key]
                continue
            for d in model.time_derivs:
                xk = model.state_optimized_name(d)
                pk = model.state_parameter_name(d)
                states = solution[xk]
                full = np.zeros((model.dim, states.shape[1]))
                full[model.optimized_joint_indexes] = states
                if model.num_param_joints:
                    full[model.parameter_joint_indexes] = np.asarray(pdict[pk])
                solution[model.state_name(d)] = full
        solution["f"] = float(self.opt.f(xvec, self._p))
        self._xsol = xvec
        return solution

    # -- diagnostics ----------------------------------------------------------

    def evaluate_cost(self, xvec=None, pvec=None) -> float:
        xvec = self._xsol if xvec is None else jnp.asarray(xvec)
        pvec = self._p if pvec is None else jnp.asarray(pvec)
        return float(self.opt.f(xvec, pvec))

    def evaluate_cost_terms(self, xvec=None, pvec=None) -> Dict[str, float]:
        xvec = self._xsol if xvec is None else jnp.asarray(xvec)
        pvec = self._p if pvec is None else jnp.asarray(pvec)
        return {k: float(v) for k, v in self.opt.cost_term_values(xvec, pvec).items()}

    def violated_constraints(self, xvec=None, pvec=None, tol: float = 1e-6) -> Dict[str, float]:
        """Named max-violation report (parity: solver.py:169-239)."""
        xvec = self._xsol if xvec is None else jnp.asarray(xvec)
        pvec = self._p if pvec is None else jnp.asarray(pvec)
        x = self.opt.x_layout.unvec(xvec)
        p = self.opt.p_layout.unvec(pvec)
        out: Dict[str, float] = {}
        for name, fn in self.opt.eq_constraints:
            viol = float(jnp.max(jnp.abs(jnp.asarray(fn(x, p)))))
            if viol > tol:
                out[name] = viol
        for name, fn in self.opt.ineq_constraints:
            viol = float(-jnp.min(jnp.asarray(fn(x, p))))
            if viol > tol:
                out[name] = viol
        return out

    def stats(self) -> Dict:
        return self._stats

    def did_solve(self, tol: float = 1e-5) -> bool:
        return not self.violated_constraints(tol=tol)

    def number_of_iterations(self) -> Optional[int]:
        return self._stats.get("iterations")

    @staticmethod
    def interpolate(traj: np.ndarray, duration: float, **kwargs):
        """Trajectory (dim, T) -> callable over [0, duration]
        (parity: solver.py:241-253)."""
        traj = np.asarray(traj)
        t = np.linspace(0.0, duration, traj.shape[1])
        return sci_interp.interp1d(t, traj, axis=1, **kwargs)


class ALSQPSolver(Solver):
    """General NLP backend (the CasADiSolver/Ipopt slot, solver.py:323)."""

    def setup(self, lo=None, hi=None, config: ALSQPConfig = ALSQPConfig()) -> "ALSQPSolver":
        opt = self.opt
        has_h = bool(opt.eq_constraints)
        has_g = bool(opt.ineq_constraints)
        solver = make_al_sqp_solver(
            opt.f,
            h=opt.h if has_h else None,
            g=opt.g if has_g else None,
            config=config,
        )
        self._lo = jnp.full(opt.nx, -jnp.inf) if lo is None else jnp.asarray(lo)
        self._hi = jnp.full(opt.nx, jnp.inf) if hi is None else jnp.asarray(hi)
        self._jit_solver = jax.jit(solver)
        return self

    def _solve_vec(self):
        x, info = self._jit_solver(self._x0, self._lo, self._hi, self._p)
        if self.opt.has_discrete_variables:
            # MINLP slot (parity surface: optimization.py:533
            # MixedIntegerNonlinearCost...; the reference never ships a MINLP
            # backend — here: relax -> round discrete coords -> polish the
            # continuous coords with the discrete ones pinned by their box)
            mask = jnp.asarray(self.opt.discrete_mask())
            x_round = jnp.where(mask, jnp.round(x), x)
            x_round = jnp.clip(x_round, self._lo, self._hi)
            lo2 = jnp.where(mask, x_round, self._lo)
            hi2 = jnp.where(mask, x_round, self._hi)
            x, info = self._jit_solver(x_round, lo2, hi2, self._p)
        self._stats = {
            "constraint_violation": float(info["constraint_violation"]),
            "f": float(info["f"]),
        }
        return x


class ADMMQPSolver(Solver):
    """Quadratic-problem backend (the OSQP/CVXOPT slot, solver.py:428-582)."""

    def setup(self, config: ADMMConfig = ADMMConfig()) -> "ADMMQPSolver":
        self._config = config
        return self

    def _solve_vec(self):
        assert self.opt.cost_is_quadratic(), "ADMMQPSolver requires a quadratic cost"
        assert self.opt.constraints_are_linear(), "ADMMQPSolver requires linear constraints"
        P, q, A, l, u = self.opt.as_qp(self._p)
        x, z, y, res = solve_qp_admm(P, q, A, l, u, x0=self._x0, config=self._config)
        self._stats = {k: float(v) for k, v in res.items()}
        self._stats["iterations"] = self._config.iterations
        return x


class ScipyMinimizeSolver(Solver):
    """Host oracle backend (parity: solver.py:589)."""

    def setup(self, method: str = "SLSQP", maxiter: int = 500) -> "ScipyMinimizeSolver":
        self._method = method
        self._maxiter = maxiter
        return self

    def _solve_vec(self):
        opt = self.opt
        p = self._p
        f = jax.jit(opt.f)
        df = jax.jit(jax.grad(opt.f))
        cons = []
        if opt.eq_constraints:
            hj = jax.jit(opt.h)
            dhj = jax.jit(opt.dh)
            cons.append(
                {
                    "type": "eq",
                    "fun": lambda xx: np.asarray(hj(jnp.asarray(xx), p), dtype=float),
                    "jac": lambda xx: np.asarray(dhj(jnp.asarray(xx), p), dtype=float),
                }
            )
        if opt.ineq_constraints:
            gj = jax.jit(opt.g)
            dgj = jax.jit(opt.dg)
            cons.append(
                {
                    "type": "ineq",
                    "fun": lambda xx: np.asarray(gj(jnp.asarray(xx), p), dtype=float),
                    "jac": lambda xx: np.asarray(dgj(jnp.asarray(xx), p), dtype=float),
                }
            )
        res = sci_opt.minimize(
            lambda xx: float(f(jnp.asarray(xx), p)),
            np.asarray(self._x0, dtype=float),
            jac=lambda xx: np.asarray(df(jnp.asarray(xx), p), dtype=float),
            constraints=cons,
            method=self._method,
            options={"maxiter": self._maxiter, "ftol": 1e-12},
        )
        self._stats = {"iterations": res.nit, "success": bool(res.success), "message": res.message}
        if self.error_on_fail and not res.success:
            raise RuntimeError(f"scipy solve failed: {res.message}")
        return jnp.asarray(res.x)
