"""Batched ADMM QP solver (OSQP-style, first-party, on-device).

Replaces the reference's OSQP/CVXOPT backends (optas/solver.py:428-582)
for quadratic problems:

    min 1/2 x^T P x + q^T x    s.t.    l <= A x <= u

Classic OSQP splitting with fixed iteration count (shape-static, so whole
batches of QPs solve under vmap):
    x+ = (P + sigma I + rho A^T A)^{-1} (sigma x - q + A^T (rho z - y))
    z+ = clip(A x+ + y / rho, l, u)
    y+ = y + rho (A x+ - z+)
The KKT matrix is factorized once (Cholesky) and reused every iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ADMMConfig(NamedTuple):
    iterations: int = 200
    rho: float = 1.0
    sigma: float = 1e-6
    alpha: float = 1.6  # over-relaxation


def solve_qp_admm(P, q, A, l, u, x0=None, config: ADMMConfig = ADMMConfig()):
    """Solve one QP; vmap for batches. Returns (x, z, y, residuals dict)."""
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    A = jnp.asarray(A)
    l = jnp.asarray(l)
    u = jnp.asarray(u)
    n = q.shape[0]
    m = l.shape[0]
    dtype = P.dtype
    rho, sigma, alpha = config.rho, config.sigma, config.alpha

    K = P + sigma * jnp.eye(n, dtype=dtype) + rho * (A.T @ A)
    chol = jnp.linalg.cholesky(K)

    def kkt_solve(b):
        yv = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, yv, lower=False)

    def body(carry, _):
        x, z, y = carry
        b = sigma * x - q + A.T @ (rho * z - y)
        x_new = kkt_solve(b)
        Ax = A @ x_new
        Ax_relaxed = alpha * Ax + (1 - alpha) * z
        z_new = jnp.clip(Ax_relaxed + y / rho, l, u)
        y_new = y + rho * (Ax_relaxed - z_new)
        return (x_new, z_new, y_new), None

    x = jnp.zeros(n, dtype) if x0 is None else jnp.asarray(x0, dtype)
    z = A @ x
    y = jnp.zeros(m, dtype)
    (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=config.iterations)

    Ax = A @ x
    primal_res = jnp.max(jnp.abs(Ax - z)) if m else jnp.asarray(0.0, dtype)
    dual_res = jnp.max(jnp.abs(P @ x + q + A.T @ y)) if m else jnp.max(jnp.abs(P @ x + q))
    return x, z, y, {"primal_res": primal_res, "dual_res": dual_res}
