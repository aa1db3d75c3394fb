"""OptimizationBuilder: the problem-construction DSL.

Functional re-design of the reference's builder
(/root/reference/optas/builder.py:12): the same allocation scheme — per
model and time-derivative, decision blocks `{model}/{d*}q/x` of shape
(num_opt_joints, T - d) and parameter blocks `{model}/{d*}q/p`
(builder.py:90-100) — and the same convenience constraints
(integrate_model_states :420-470, enforce_model_limits :472-510,
initial_configuration :512-524, fix_configuration :526,
sphere_collision_avoidance_constraints :367-418). The difference: instead
of eagerly building CasADi expression graphs, cost terms and constraints
are PLAIN FUNCTIONS over dicts of named jnp blocks; `build()` assembles
them into one traced program (see opt/taxonomy.py), which the solvers jit
once and reuse for every problem instance.

Cost/constraint callables receive (x: dict, p: dict) where each entry is
the (rows, cols) block array.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.models.robot import Model, RobotModel, TaskModel
from grasptrajopt_tpu.opt.layout import BlockLayout
from grasptrajopt_tpu.opt.taxonomy import Optimization


class OptimizationBuilder:
    def __init__(
        self,
        T: int,
        robots: Union[Sequence[RobotModel], RobotModel] = (),
        tasks: Union[Sequence[TaskModel], TaskModel] = (),
        derivs_align: bool = False,
    ):
        assert T > 0, "T must be strictly positive"
        if isinstance(robots, Model):
            robots = [robots]
        if isinstance(tasks, Model):
            tasks = [tasks]
        self.T = T
        self.derivs_align = derivs_align
        self._models: List[Model] = list(robots) + list(tasks)
        names = [m.get_name() for m in self._models]
        assert len(names) == len(set(names)), "each model should have a unique name"

        self.x_layout = BlockLayout()
        self.p_layout = BlockLayout()
        self._cost_terms: List[tuple] = []  # (name, fn)
        self._eq: List[tuple] = []  # (name, fn) fn == 0
        self._ineq: List[tuple] = []  # (name, fn) fn >= 0

        for model in self._models:
            for d in model.time_derivs:
                t = T - d if not derivs_align else T
                if isinstance(model, RobotModel):
                    self.add_decision_variables(model.state_optimized_name(d), model.num_opt_joints, t)
                    self.add_parameter(model.state_parameter_name(d), model.num_param_joints, t)
                else:
                    # TaskModel may declare integer-valued states
                    # (parity: builder.py:100 passes model.is_discrete)
                    self.add_decision_variables(
                        model.state_optimized_name(d), model.dim, t,
                        is_discrete=getattr(model, "is_discrete", False),
                    )

    # -- model access ---------------------------------------------------------

    def get_model_names(self) -> List[str]:
        return [m.get_name() for m in self._models]

    def get_model(self, name: str) -> Model:
        return self._models[self.get_model_names().index(name)]

    def get_model_states(self, x: dict, name: str, time_deriv: int = 0):
        """Decision-state block of a model from an x-dict (used inside cost
        and constraint callables)."""
        model = self.get_model(name)
        assert time_deriv in model.time_derivs
        return x[model.state_optimized_name(time_deriv)]

    def get_model_parameters(self, p: dict, name: str, time_deriv: int = 0):
        model = self.get_model(name)
        return p[model.state_parameter_name(time_deriv)]

    def get_robot_states_and_parameters(self, x: dict, p: dict, name: str, time_deriv: int = 0):
        """Scatter x and p blocks back to the full (ndof, T) array
        (parity: builder.py:179-205)."""
        model = self.get_model(name)
        states = self.get_model_states(x, name, time_deriv)
        out = jnp.zeros((model.dim, states.shape[1]), states.dtype)
        out = out.at[jnp.asarray(model.optimized_joint_indexes, int)].set(states)
        if model.num_param_joints:
            params = self.get_model_parameters(p, name, time_deriv)
            out = out.at[jnp.asarray(model.parameter_joint_indexes, int)].set(params)
        return out

    # -- variable/parameter/cost registration ---------------------------------

    def add_decision_variables(self, name: str, m: int, n: int = 1, is_discrete: bool = False) -> None:
        """Register a decision block; is_discrete marks it integer-valued
        (parity: builder.py:248-261 -> sx_container.variable_is_discrete)."""
        self.x_layout.add(name, m, n, discrete=is_discrete)

    def add_parameter(self, name: str, m: int, n: int = 1) -> None:
        self.p_layout.add(name, m, n)

    def add_cost_term(self, name: str, fn: Callable) -> None:
        """fn(x, p) -> scalar."""
        self._cost_terms.append((name, fn))

    def add_equality_constraint(self, name: str, fn: Callable) -> None:
        """fn(x, p) == 0 (any shape; flattened)."""
        self._eq.append((name, fn))

    def add_geq_inequality_constraint(self, name: str, fn: Callable) -> None:
        """fn(x, p) >= 0."""
        self._ineq.append((name, fn))

    def add_leq_inequality_constraint(self, name: str, fn: Callable) -> None:
        """fn(x, p) <= 0."""
        self._ineq.append((name, lambda x, p, f=fn: -jnp.asarray(f(x, p))))

    def add_bound_inequality_constraint(self, name: str, lo, fn: Callable, hi) -> None:
        """lo <= fn(x, p) <= hi (parity: builder.py add_bound_inequality)."""
        lo = jnp.asarray(lo)
        hi = jnp.asarray(hi)
        self._ineq.append((name + "_lower", lambda x, p, f=fn: jnp.asarray(f(x, p)) - lo))
        self._ineq.append((name + "_upper", lambda x, p, f=fn: hi - jnp.asarray(f(x, p))))

    # -- convenience constraints (reference parity) ---------------------------

    def initial_configuration(self, name: str, init=None, time_deriv: int = 0) -> None:
        """x[:, 0] == init (zeros when None). Parity: builder.py:512-524."""
        model = self.get_model(name)
        key = model.state_optimized_name(time_deriv)

        def fn(x, p):
            x0 = x[key][:, 0]
            if init is None:
                return x0
            if callable(init):
                return x0 - init(p)
            return x0 - jnp.asarray(init, x0.dtype)

        self.add_equality_constraint(f"__{name}_initial_configuration_{time_deriv}__", fn)

    def fix_configuration(self, name: str, config=None, time_deriv: int = 0, t: int = 0) -> None:
        model = self.get_model(name)
        key = model.state_optimized_name(time_deriv)

        def fn(x, p):
            xt = x[key][:, t]
            if config is None:
                return xt
            if callable(config):
                return xt - config(p)
            return xt - jnp.asarray(config, xt.dtype)

        self.add_equality_constraint(f"__{name}_fix_configuration_{time_deriv}_{t}__", fn)

    def integrate_model_states(self, name: str, time_deriv: int, dt) -> None:
        """Explicit-Euler coupling x_{t+1} = x_t + dt * xd_t
        (parity: builder.py:420-470)."""
        model = self.get_model(name)
        n = self.T - (1 if self.derivs_align else time_deriv)
        dt_arr = jnp.broadcast_to(jnp.asarray(dt, jnp.float64), (n,))
        xk = model.state_optimized_name(time_deriv - 1)
        xdk = model.state_optimized_name(time_deriv)

        def fn(x, p):
            xs = x[xk]
            xds = x[xdk]
            if self.derivs_align:
                xds = xds[:, :-1]
            return xs[:, :-1] + dt_arr.astype(xs.dtype) * xds - xs[:, 1:]

        self.add_equality_constraint(f"__integrate_model_states_{name}_{time_deriv}__", fn)

    def enforce_model_limits(self, name: str, time_deriv: int = 0, lo=None, up=None, safe_frac: float = 1.0) -> None:
        """Box limits as bound inequality constraints
        (parity: builder.py:472-510)."""
        assert 0.0 < safe_frac <= 1.0
        model = self.get_model(name)
        xlo, xup = lo, up
        if xlo is None or xup is None:
            mlo, mup = model.get_limits(time_deriv)
            xlo = mlo if xlo is None else xlo
            xup = mup if xup is None else xup
        xlo = np.asarray(xlo, dtype=np.float64).reshape(-1)
        xup = np.asarray(xup, dtype=np.float64).reshape(-1)
        if safe_frac < 1.0:
            mid = 0.5 * (xlo + xup)
            half = 0.5 * safe_frac * (xup - xlo)
            xlo, xup = mid - half, mid + half
        key = model.state_optimized_name(time_deriv)
        self.add_bound_inequality_constraint(
            f"__{name}_model_limit_{time_deriv}__",
            xlo[:, None],
            lambda x, p: x[key],
            xup[:, None],
        )

    def sphere_collision_avoidance_constraints(
        self,
        name: str,
        obstacle_names: Sequence[str],
        link_names: Optional[Sequence[str]] = None,
        link_radii: Optional[Sequence[float]] = None,
    ) -> None:
        """Sphere-vs-sphere separation: per step, per link, per obstacle,
        ||p_link - p_obs||^2 >= (r_link + r_obs)^2. Obstacle positions/radii
        become parameters `{obs}_position`, `{obs}_radii`
        (parity: builder.py:367-418)."""
        assert len(obstacle_names), "at least one obstacle should be named"
        model = self.get_model(name)
        assert isinstance(model, RobotModel)
        if link_names is None:
            link_names = model.link_names
        if link_radii is None:
            link_radii = [0.0] * len(link_names)
        for obs in obstacle_names:
            self.add_parameter(obs + "_position", 3)
            self.add_parameter(obs + "_radii", 1)

        n = self.T if 0 in model.time_derivs else 1
        key = model.state_optimized_name(0)

        def fn(x, p):
            Q = self.get_robot_states_and_parameters(x, p, name)
            out = []
            for link, rad in zip(link_names, link_radii):
                pos = model.get_global_link_position(link, Q.T)  # (T, 3)
                for obs in obstacle_names:
                    obs_p = p[obs + "_position"].reshape(3)
                    obs_r = p[obs + "_radii"].reshape(())
                    dist2 = jnp.sum((pos - obs_p) ** 2, axis=-1)
                    out.append(dist2 - (rad + obs_r) ** 2)
            return jnp.concatenate(out)

        self.add_geq_inequality_constraint(f"__{name}_sphere_collision_avoidance__", fn)

    # -- assembly -------------------------------------------------------------

    def build(self) -> Optimization:
        return Optimization(
            x_layout=self.x_layout,
            p_layout=self.p_layout,
            cost_terms=list(self._cost_terms),
            eq_constraints=list(self._eq),
            ineq_constraints=list(self._ineq),
            models=list(self._models),
        )
