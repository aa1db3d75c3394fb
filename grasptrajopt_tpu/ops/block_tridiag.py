"""Batched block-tridiagonal SPD solve (block Thomas / Cholesky recursion).

The trajectory Gauss-Newton Hessian is block-tridiagonal in time: smoothness
couples adjacent steps, every other cost term is block-diagonal (see
grasptrajopt_tpu.opt.trajectory). Solving H dx = -g therefore costs
O(T n^3) instead of O((Tn)^3); the recursion is a `lax.scan` over T with
(n, n) blocks, and the whole solve vmaps over a batch axis of problems.

This replaces the dense KKT factorizations Ipopt performs in the reference
(optas/solver.py:384 nlpsol hot loop) with a structure-exploiting on-device
solve. For very long horizons the same system admits parallel-in-time
cyclic reduction; at T=50 the sequential scan is already negligible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_tridiag_solve(diag, lower, rhs):
    """Solve H x = rhs with H SPD block-tridiagonal.

    diag:  (T, n, n)  — diagonal blocks D_t (symmetric)
    lower: (T-1, n, n) — sub-diagonal blocks L_t = H[t+1, t]
    rhs:   (T, n)

    Returns x: (T, n). Uses the block LDL^T (Schur) recursion:
        S_0 = D_0,  S_t = D_t - L_{t-1} S_{t-1}^{-1} L_{t-1}^T
    with per-block Cholesky factorizations.
    """
    T, n, _ = diag.shape
    eye = jnp.eye(n, dtype=diag.dtype)

    def chol_solve(chol, b):
        y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    # Forward sweep: factor Schur complements, reduce rhs.
    def fwd(carry, inp):
        chol_prev, y_prev = carry
        D_t, L_prev, b_t = inp
        # W = S_{t-1}^{-1} L_{t-1}^T  (n, n)
        W = chol_solve(chol_prev, jnp.swapaxes(L_prev, -1, -2))
        S_t = D_t - L_prev @ W
        chol_t = jnp.linalg.cholesky(S_t)
        y_t = b_t - L_prev @ chol_solve(chol_prev, y_prev)
        return (chol_t, y_t), (chol_t, y_t)

    chol0 = jnp.linalg.cholesky(diag[0])
    y0 = rhs[0]
    (_, _), (chols, ys) = jax.lax.scan(
        fwd, (chol0, y0), (diag[1:], lower, rhs[1:])
    )
    chols = jnp.concatenate([chol0[None], chols], axis=0)  # (T, n, n)
    ys = jnp.concatenate([y0[None], ys], axis=0)  # (T, n)

    # Backward sweep: x_{T-1} = S^{-1} y; x_t = S_t^{-1} (y_t - L_t^T x_{t+1})
    xT = chol_solve(chols[-1], ys[-1])

    def bwd(x_next, inp):
        chol_t, y_t, L_t = inp
        x_t = chol_solve(chol_t, y_t - jnp.swapaxes(L_t, -1, -2) @ x_next)
        return x_t, x_t

    _, xs_rev = jax.lax.scan(
        bwd, xT, (chols[:-1][::-1], ys[:-1][::-1], lower[::-1])
    )
    return jnp.concatenate([xs_rev[::-1], xT[None]], axis=0)


def block_tridiag_matvec(diag, lower, x):
    """H @ x for the same block-tridiagonal layout (tests / CG fallback)."""
    y = jnp.einsum("tij,tj->ti", diag, x)
    y = y.at[1:].add(jnp.einsum("tij,tj->ti", lower, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("tji,tj->ti", lower, x[1:]))
    return y
