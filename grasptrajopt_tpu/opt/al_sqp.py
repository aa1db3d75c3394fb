"""General constrained NLP solver: augmented Lagrangian with damped-Newton
inner iterations, box projection, fixed budgets, jit/vmap-safe.

This is the general-purpose replacement for the reference's CasADi/Ipopt
backend (optas/solver.py:323 CasADiSolver): it accepts arbitrary smooth
  min f(x, p)   s.t.  h(x, p) = 0,  g(x, p) >= 0,  lo <= x <= hi
with autodiff derivatives. The three shipped planners do NOT need it (their
constraints are eliminated structurally — see opt/trajectory.py); it exists
so arbitrary user problems expressed through the builder DSL solve on
device, completing the optas API surface.

Method: PHR augmented Lagrangian.
  L(x) = f + lam.h + rho/2 ||h||^2 + 1/(2 rho) sum(max(0, mu - rho g)^2 - mu^2)
Outer updates: lam += rho h;  mu = max(0, mu - rho g); rho grows when
constraint violation stalls. Inner: LM-damped Newton on L with projected
line search (exact autodiff Hessian — suitable for the moderate dimensions
of trajectory NLPs; the structured planners handle the large-scale path).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class ALSQPConfig(NamedTuple):
    outer_iterations: int = 10
    inner_iterations: int = 15
    rho_init: float = 10.0
    rho_growth: float = 4.0
    rho_max: float = 1e6
    lambda_init: float = 1e-3
    lambda_decrease: float = 0.5
    lambda_increase: float = 4.0
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03)
    jitter: float = 1e-8


def make_al_sqp_solver(
    f: Callable,
    h: Optional[Callable] = None,
    g: Optional[Callable] = None,
    config: ALSQPConfig = ALSQPConfig(),
):
    """Build `solve(x0, lo, hi, params) -> (x, info)`.

    f(x, p) -> scalar; h(x, p) -> (nh,) equalities; g(x, p) -> (ng,)
    inequalities (>= 0). Either constraint function may be None.
    """

    def h_fn(x, p):
        return h(x, p) if h is not None else jnp.zeros(0, x.dtype)

    def g_fn(x, p):
        return g(x, p) if g is not None else jnp.zeros(0, x.dtype)

    def al(x, p, lam, mu, rho):
        hv = h_fn(x, p)
        gv = g_fn(x, p)
        val = f(x, p) + jnp.dot(lam, hv) + 0.5 * rho * jnp.dot(hv, hv)
        shifted = jnp.maximum(0.0, mu - rho * gv)
        val = val + (jnp.dot(shifted, shifted) - jnp.dot(mu, mu)) / (2.0 * rho)
        return val

    grad_al = jax.grad(al)
    hess_al = jax.hessian(al)

    def solve(x0, lo, hi, params):
        dtype = x0.dtype
        n = x0.shape[0]
        eye = jnp.eye(n, dtype=dtype)
        alphas = jnp.asarray(config.alphas, dtype)
        nh = h_fn(x0, params).shape[0]
        ng = g_fn(x0, params).shape[0]

        def inner(x, p, lam, mu, rho):
            def body(carry, _):
                x, lm_damp, c = carry
                gvec = grad_al(x, p, lam, mu, rho)
                H = hess_al(x, p, lam, mu, rho)
                scale = jnp.maximum(jnp.abs(jnp.diag(H)), config.jitter)
                A = H + lm_damp * jnp.diag(scale) + config.jitter * eye
                # solve may fail on indefinite H: fall back toward gradient
                dx = -jnp.linalg.solve(A, gvec)
                dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, -gvec)
                cands = jnp.clip(x[None] + alphas[:, None] * dx[None], lo, hi)
                costs = jax.vmap(lambda xx: al(xx, p, lam, mu, rho))(cands)
                best = jnp.argmin(costs)
                accept = costs[best] < c
                x_new = jnp.where(accept, cands[best], x)
                c_new = jnp.where(accept, costs[best], c)
                damp_new = jnp.clip(
                    jnp.where(accept, lm_damp * config.lambda_decrease, lm_damp * config.lambda_increase),
                    1e-10,
                    1e10,
                )
                return (x_new, damp_new, c_new), None

            init = (x, jnp.asarray(config.lambda_init, dtype), al(x, p, lam, mu, rho))
            (x, _, _), _ = jax.lax.scan(body, init, None, length=config.inner_iterations)
            return x

        def outer(carry, _):
            x, lam, mu, rho, viol_prev = carry
            x = inner(x, params, lam, mu, rho)
            hv = h_fn(x, params)
            gv = g_fn(x, params)
            lam = lam + rho * hv
            mu = jnp.maximum(0.0, mu - rho * gv)
            viol = jnp.sqrt(
                jnp.sum(hv * hv) + jnp.sum(jnp.minimum(gv, 0.0) ** 2)
            )
            rho = jnp.where(viol > 0.25 * viol_prev, jnp.minimum(rho * config.rho_growth, config.rho_max), rho)
            return (x, lam, mu, rho, viol), viol

        x0c = jnp.clip(jnp.asarray(x0, dtype), lo, hi)
        init = (
            x0c,
            jnp.zeros(nh, dtype),
            jnp.zeros(ng, dtype),
            jnp.asarray(config.rho_init, dtype),
            jnp.asarray(jnp.inf, dtype),
        )
        (x, lam, mu, rho, viol), viols = jax.lax.scan(
            outer, init, None, length=config.outer_iterations
        )
        info = {
            "f": f(x, params),
            "constraint_violation": viol,
            "lam": lam,
            "mu": mu,
            "rho": rho,
        }
        return x, info

    return solve
