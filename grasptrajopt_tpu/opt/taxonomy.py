"""Optimization: the canonical assembled problem object.

Replaces the reference's optimization taxonomy
(/root/reference/optas/optimization.py:54-568): one object holding
  f(x, p)             cost (sum of named terms)
  h(x, p) = 0         stacked equality constraints
  g(x, p) >= 0        stacked inequality constraints
with derivatives by autodiff (df/ddf: optimization.py:192-204; constraint
Jacobians :262-290) and the stacked "verticalized" view
v = [g; h; -h] >= 0 (vertcon, optimization.py:27-51).

Instead of the reference's seven symbolic problem classes dispatched at
build time (:312-533), classification here is numeric probing on traced
functions: costs are tested for quadratic-ness and constraints for
linearity by comparing derivatives at random probe points — enough to
route problems to the QP (ADMM) vs NLP (AL-SQP) solvers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.opt.layout import BlockLayout


@dataclass
class Optimization:
    x_layout: BlockLayout
    p_layout: BlockLayout
    cost_terms: List[Tuple[str, Callable]]
    eq_constraints: List[Tuple[str, Callable]]
    ineq_constraints: List[Tuple[str, Callable]]
    models: List = field(default_factory=list)

    # -- scalar cost and stacked constraints over flat vectors ---------------

    @property
    def nx(self) -> int:
        return self.x_layout.size

    @property
    def np_(self) -> int:
        return self.p_layout.size

    def f(self, xvec, pvec):
        x = self.x_layout.unvec(xvec)
        p = self.p_layout.unvec(pvec)
        total = jnp.asarray(0.0, jnp.asarray(xvec).dtype)
        for _, fn in self.cost_terms:
            total = total + jnp.asarray(fn(x, p)).sum()
        return total

    def cost_term_values(self, xvec, pvec) -> Dict[str, jnp.ndarray]:
        x = self.x_layout.unvec(xvec)
        p = self.p_layout.unvec(pvec)
        return {name: jnp.asarray(fn(x, p)).sum() for name, fn in self.cost_terms}

    def h(self, xvec, pvec):
        """Stacked equalities (== 0)."""
        x = self.x_layout.unvec(xvec)
        p = self.p_layout.unvec(pvec)
        parts = [jnp.asarray(fn(x, p)).reshape(-1) for _, fn in self.eq_constraints]
        dtype = jnp.asarray(xvec).dtype
        return jnp.concatenate(parts) if parts else jnp.zeros(0, dtype)

    def g(self, xvec, pvec):
        """Stacked inequalities (>= 0)."""
        x = self.x_layout.unvec(xvec)
        p = self.p_layout.unvec(pvec)
        parts = [jnp.asarray(fn(x, p)).reshape(-1) for _, fn in self.ineq_constraints]
        dtype = jnp.asarray(xvec).dtype
        return jnp.concatenate(parts) if parts else jnp.zeros(0, dtype)

    def v(self, xvec, pvec):
        """Verticalized constraints [g; h; -h] >= 0 (parity: vertcon)."""
        hv = self.h(xvec, pvec)
        return jnp.concatenate([self.g(xvec, pvec), hv, -hv])

    # derivatives (parity: df/ddf/dg/dh in optimization.py)
    def df(self, xvec, pvec):
        return jax.grad(self.f)(xvec, pvec)

    def ddf(self, xvec, pvec):
        return jax.hessian(self.f)(xvec, pvec)

    def dh(self, xvec, pvec):
        return jax.jacfwd(self.h)(xvec, pvec)

    def dg(self, xvec, pvec):
        return jax.jacfwd(self.g)(xvec, pvec)

    # -- classification (numeric probing) ------------------------------------

    def _probe_points(self, seed: int = 0, count: int = 2):
        rng = np.random.default_rng(seed)
        xs = [jnp.asarray(rng.normal(size=self.nx), jnp.float64) for _ in range(count)]
        pv = jnp.asarray(rng.normal(size=self.np_), jnp.float64)
        return xs, pv

    def cost_is_quadratic(self) -> bool:
        """Constant Hessian at two probe points (heuristic but exact for
        polynomial costs)."""
        xs, pv = self._probe_points()
        H0 = np.asarray(self.ddf(xs[0], pv))
        H1 = np.asarray(self.ddf(xs[1], pv))
        return bool(np.allclose(H0, H1, atol=1e-9))

    def constraints_are_linear(self) -> bool:
        xs, pv = self._probe_points(seed=1)
        for deriv in (self.dh, self.dg):
            J0 = np.asarray(deriv(xs[0], pv))
            J1 = np.asarray(deriv(xs[1], pv))
            if not np.allclose(J0, J1, atol=1e-9):
                return False
        return True

    # -- discrete (integer) decision variables --------------------------------

    @property
    def has_discrete_variables(self) -> bool:
        """Parity: optimization.py:308-309."""
        return self.x_layout.has_discrete_variables()

    def discrete_mask(self) -> np.ndarray:
        """(nx,) bool mask over the flat decision vector."""
        return self.x_layout.discrete_mask()

    @property
    def problem_class(self) -> str:
        """Mirror of the reference's dispatch (builder.py:546-636; the
        MixedInteger prefix mirrors builder.py:560-601)."""
        quad = self.cost_is_quadratic()
        has_con = bool(self.eq_constraints or self.ineq_constraints)
        lin = self.constraints_are_linear() if has_con else True
        cost = "QuadraticCost" if quad else "NonlinearCost"
        prefix = "MixedInteger" if self.has_discrete_variables else ""
        if not has_con:
            return prefix + cost + "Unconstrained"
        return prefix + cost + ("LinearConstraints" if lin else "NonlinearConstraints")

    # -- QP materialization (Jacobian-at-zero trick) -------------------------

    def as_qp(self, pvec):
        """Materialize P, q, A, l, u for quadratic problems — the
        reference's linear-constraint extraction via Jacobians at zero
        (optimization.py:225-260)."""
        zero = jnp.zeros(self.nx, jnp.float64)
        P = self.ddf(zero, pvec)
        q = self.df(zero, pvec)
        A_g = self.dg(zero, pvec)
        b_g = self.g(zero, pvec)
        A_h = self.dh(zero, pvec)
        b_h = self.h(zero, pvec)
        big = 1e20
        A = jnp.concatenate([A_g, A_h], axis=0)
        l = jnp.concatenate([-b_g, -b_h])
        u = jnp.concatenate([jnp.full_like(b_g, big), -b_h])
        return P, q, A, l, u
