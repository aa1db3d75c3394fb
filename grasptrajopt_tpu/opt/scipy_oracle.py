"""SciPy oracle adapter: solve the same box-constrained NLPs with
scipy.optimize (host, float64) to validate the on-device LM solvers.

This is the reference repo's own cross-check pattern — it solves planar IK
with both CasADi/Ipopt and SciPy/SLSQP and compares
(examples/planar_ik.py:51-68); the reference also ships a ScipyMinimizeSolver
backend (optas/solver.py:589). BASELINE.md's acceptance criterion is
trajectory match vs a SciPy reference under the same iteration budget.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from scipy import optimize

import jax
import jax.numpy as jnp


def solve_scipy_box(
    residual_fn: Callable,
    x0: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    params,
    value_fn: Optional[Callable] = None,
    method: str = "SLSQP",
    maxiter: int = 200,
):
    """Minimize sum(r^2) + v over a box with scipy; returns (x, cost)."""

    def cost(x, p):
        r = residual_fn(jnp.asarray(x), p)
        c = jnp.sum(r * r)
        if value_fn is not None:
            c = c + value_fn(jnp.asarray(x), p)
        return c

    cost_jit = jax.jit(cost)
    grad_jit = jax.jit(jax.grad(cost))

    f = lambda x: float(cost_jit(x, params))
    g = lambda x: np.asarray(grad_jit(x, params), dtype=np.float64)

    res = optimize.minimize(
        f,
        np.asarray(x0, dtype=np.float64),
        jac=g,
        bounds=list(zip(np.asarray(lo, dtype=float), np.asarray(hi, dtype=float))),
        method=method,
        options={"maxiter": maxiter, "ftol": 1e-12},
    )
    return res.x, float(res.fun)
