"""Dense projected Levenberg-Marquardt with box constraints.

Solves   min_x  ||r(x, p)||^2 + v(x, p)   s.t.  lo <= x <= hi

with a Gauss-Newton Hessian from `r`, gradient from full autodiff (so
value-only terms `v` steer the search), Marquardt diagonal damping adapted
by step acceptance, and a projected backtracking line search (candidate
steps are clipped to the box before evaluation — Bertsekas-style projected
Newton).

This is the IK-screen / base-pose solver: the problems the reference hands
to Ipopt with T=1 (gto/ik_solver.py:75 max_iter=50) or goal_size columns
(gto/base_planner.py:92). Dimensions are tiny (<= ~100), so a dense solve
per iteration is cheaper than any structure exploitation; thousands of
instances run under vmap.

Conventions: cost C(x) = sum(r^2) + v;  g = grad C / 2;  H ~= J^T J.
The fixed iteration budget keeps the program shape-static; iterations are a
`lax.scan`, so compile once, run for any batch.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    iterations: int = 50
    lambda_init: float = 1e-3
    lambda_decrease: float = 0.5
    lambda_increase: float = 4.0
    lambda_min: float = 1e-9
    lambda_max: float = 1e8
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03)
    jitter: float = 1e-9


def make_box_lm_solver(
    residual_fn: Callable,
    value_fn: Optional[Callable] = None,
    config: LMConfig = LMConfig(),
):
    """Build a jit-able solver `solve(x0, lo, hi, params) -> (x, cost, aux)`.

    residual_fn(x, params) -> (R,) residual vector (cost contributes sum r^2)
    value_fn(x, params) -> scalar added to the cost (gradient-only term —
        e.g. the IK obstacle cost 10 * sum(sdf), gto/ik_solver.py:69, which
        is linear in field values and has no useful GN curvature)
    """

    def cost_fn(x, params):
        r = residual_fn(x, params)
        c = jnp.sum(r * r)
        if value_fn is not None:
            c = c + value_fn(x, params)
        return c

    grad_fn = jax.grad(cost_fn)

    def solve(x0, lo, hi, params):
        x0 = jnp.clip(jnp.asarray(x0), lo, hi)
        n = x0.shape[0]
        eye = jnp.eye(n, dtype=x0.dtype)
        alphas = jnp.asarray(config.alphas, dtype=x0.dtype)

        def body(carry, _):
            x, lam, c = carry
            r = residual_fn(x, params)
            J = jax.jacfwd(residual_fn)(x, params)
            H = J.T @ J
            g = 0.5 * grad_fn(x, params)

            scale = jnp.maximum(jnp.diag(H), config.jitter)
            A = H + lam * jnp.diag(scale) + config.jitter * eye
            dx = -jnp.linalg.solve(A, g)

            cands = jnp.clip(x[None, :] + alphas[:, None] * dx[None, :], lo, hi)
            cand_costs = jax.vmap(lambda xx: cost_fn(xx, params))(cands)
            best = jnp.argmin(cand_costs)
            best_cost = cand_costs[best]
            accept = best_cost < c

            x_new = jnp.where(accept, cands[best], x)
            c_new = jnp.where(accept, best_cost, c)
            lam_new = jnp.clip(
                jnp.where(accept, lam * config.lambda_decrease, lam * config.lambda_increase),
                config.lambda_min,
                config.lambda_max,
            )
            return (x_new, lam_new, c_new), None

        init = (x0, jnp.asarray(config.lambda_init, x0.dtype), cost_fn(x0, params))
        (x, lam, c), _ = jax.lax.scan(body, init, None, length=config.iterations)
        return x, c, {"lambda": lam}

    return solve


def solve_box_lm(residual_fn, x0, lo, hi, params, value_fn=None, config: LMConfig = LMConfig()):
    """One-shot convenience wrapper around make_box_lm_solver."""
    return make_box_lm_solver(residual_fn, value_fn, config)(x0, lo, hi, params)
