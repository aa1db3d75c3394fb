"""Block-tridiagonal projected Levenberg-Marquardt over a trajectory.

The grasp-trajectory NLP the reference builds symbolically and hands to
Ipopt (gto/gto_planner.py:42-142) is re-posed here so that ALL equality
constraints vanish structurally:

  reference decision vars:  q (n_opt, T) and dq (n_opt, T-1)
  reference constraints:    q[:,0] = qc;  dq[:,0] = 0;
                            q[:,t+1] = q[:,t] + dt dq[:,t]   (Euler,
                            optas/builder.py:420-470);  box limits on q.

  dq is fully determined by q (dq_t = (q_{t+1}-q_t)/dt), and dq_0 = 0 pins
  q_1 = q_0 = qc. So the decision variable is exactly X = q[:, 2:T], with
  the SAME feasible set: box limits become a clip, the velocity regularizer
  0.01*sum(dq^2) becomes a smoothness term with weight w = 0.01/dt^2, and
  dynamics hold by construction (zero residual, unlike a penalty method).

Per-step cost terms (obstacle SDF cost, goal point-match at specific steps)
depend on a single q_t each, so the Gauss-Newton Hessian over X is
block-diagonal (J_t^T J_t) plus the smoothness tridiagonal — solved exactly
per iteration by `ops.block_tridiag_solve` in O(T n^3). The nonsmooth
goal-set min (optas.mmin over candidate grasps, gto_planner.py:105) is
handled by freezing the active selection per iteration through a
`pre_iteration` hook, standard for minimizing a pointwise min of smooth
functions.

Everything is one jit program with a fixed iteration budget (`lax.scan`),
vmappable over a batch of problem instances.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.ops import block_tridiag_solve


class TrajectoryConfig(NamedTuple):
    T: int  # total trajectory steps (reference: 50, gto_planner.py:25)
    n_fixed: int = 2  # leading steps pinned to qc (q_0 = q_1 = qc)
    smooth_weight: float = 0.0  # w = vel_weight / dt^2
    iterations: int = 50
    lambda_init: float = 1e-3
    lambda_decrease: float = 0.5
    lambda_increase: float = 4.0
    lambda_min: float = 1e-9
    lambda_max: float = 1e8
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03)
    jitter: float = 1e-9


def make_trajectory_solver(
    step_residual_fn: Callable,
    config: TrajectoryConfig,
    pre_iteration: Optional[Callable] = None,
    step_value_fn: Optional[Callable] = None,
):
    """Build `solve(qc_opt, X0, lo, hi, params) -> (Q_opt, cost, aux)`.

    step_residual_fn(q_opt_t, t, step_aux, params) -> (R,): residuals of one
        trajectory step (obstacle field values, masked goal point-matches...).
        `t` is a traced int32 scalar; per-step behavior switches must use
        jnp.where over t, keeping one shape for all steps.
    pre_iteration(Q_opt, params) -> step_aux: computed once per LM iteration
        from the full current trajectory (e.g. active-goal selection);
        frozen during the step and line search.
    step_value_fn(q_opt_t, t, step_aux, params) -> scalar: optional
        gradient-only cost per step.

    Solve inputs:
      qc_opt: (n,) start configuration (optimized joints)
      X0: (T - n_fixed, n) initial guess for the free steps
      lo, hi: (n,) box limits
      params: pytree closed over by the cost functions

    Returns Q_opt (T, n) — the full optimized-joint trajectory including the
    pinned prefix — the final cost, and diagnostics.
    """
    T = config.T
    nf = config.n_fixed
    F = T - nf
    w = config.smooth_weight

    t_all = jnp.arange(T, dtype=jnp.int32)

    def assemble(X, qc_opt):
        prefix = jnp.broadcast_to(qc_opt, (nf,) + qc_opt.shape)
        return jnp.concatenate([prefix, X], axis=0)  # (T, n)

    def residuals_all(Q, step_aux, params):
        return jax.vmap(lambda q, t: step_residual_fn(q, t, step_aux, params))(Q, t_all)

    def cost_fn(X, qc_opt, step_aux, params):
        Q = assemble(X, qc_opt)
        r = residuals_all(Q, step_aux, params)
        c = jnp.sum(r * r)
        if step_value_fn is not None:
            vals = jax.vmap(lambda q, t: step_value_fn(q, t, step_aux, params))(Q, t_all)
            c = c + jnp.sum(vals)
        if w > 0.0:
            dq = Q[1:] - Q[:-1]
            c = c + w * jnp.sum(dq * dq)
        return c

    grad_fn = jax.grad(cost_fn)

    def solve(qc_opt, X0, lo, hi, params):
        n = qc_opt.shape[0]
        dtype = qc_opt.dtype
        X0 = jnp.clip(jnp.asarray(X0, dtype), lo, hi)
        alphas = jnp.asarray(config.alphas, dtype)
        eye = jnp.eye(n, dtype=dtype)

        # Smoothness structure over the free steps (cols t = nf..T-1):
        # each free col couples to its neighbors; col nf also couples to the
        # pinned col nf-1 (contributing w to its diagonal).
        vel_diag = w * jnp.where(jnp.arange(F) < F - 1, 2.0, 1.0).astype(dtype)
        L_off = jnp.broadcast_to(-w * eye, (F - 1, n, n))

        def iteration(carry, _):
            X, lam, c, aux_prev = carry
            Q = assemble(X, qc_opt)
            step_aux = pre_iteration(Q, params) if pre_iteration is not None else aux_prev

            ci = cost_fn(X, qc_opt, step_aux, params)
            g = 0.5 * grad_fn(X, qc_opt, step_aux, params)  # (F, n)

            # Per-step GN blocks for the free steps.
            def step_jtj(q_t, t):
                J = jax.jacfwd(lambda qq: step_residual_fn(qq, t, step_aux, params))(q_t)
                return J.T @ J

            H_blocks = jax.vmap(step_jtj)(Q[nf:], t_all[nf:])  # (F, n, n)
            scale = jnp.maximum(jax.vmap(jnp.diag)(H_blocks) + vel_diag[:, None], config.jitter)
            D = (
                H_blocks
                + vel_diag[:, None, None] * eye
                + lam * jax.vmap(jnp.diag)(scale)
                + config.jitter * eye
            )
            dX = -block_tridiag_solve(D, L_off, g)

            cands = jnp.clip(X[None] + alphas[:, None, None] * dX[None], lo, hi)
            cand_costs = jax.vmap(lambda XX: cost_fn(XX, qc_opt, step_aux, params))(cands)
            best = jnp.argmin(cand_costs)
            best_cost = cand_costs[best]
            accept = best_cost < ci

            X_new = jnp.where(accept, cands[best], X)
            c_new = jnp.where(accept, best_cost, ci)
            lam_new = jnp.clip(
                jnp.where(accept, lam * config.lambda_decrease, lam * config.lambda_increase),
                config.lambda_min,
                config.lambda_max,
            )
            return (X_new, lam_new, c_new, step_aux), None

        aux0 = (
            pre_iteration(assemble(X0, qc_opt), params)
            if pre_iteration is not None
            else None
        )
        c0 = cost_fn(X0, qc_opt, aux0, params)
        init = (X0, jnp.asarray(config.lambda_init, dtype), c0, aux0)
        (X, lam, c, step_aux), _ = jax.lax.scan(iteration, init, None, length=config.iterations)
        Q = assemble(X, qc_opt)
        return Q, c, {"lambda": lam, "step_aux": step_aux}

    return solve
