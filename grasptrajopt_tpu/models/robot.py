"""RobotModel / TaskModel: the user-facing robot abstraction.

Functional parity with the reference's optas models
(/root/reference/optas/models.py): joint classification (actuated vs fixed;
optimized vs *parameter* joints — parameter joints are problem inputs, not
decision variables, optas/models.py:366-412), URDF joint limits with ±1e9
defaults (:438-466), global/relative link transforms, quaternion/RPY FK,
geometric Jacobians, random sampling, and base-frame re-rooting (:552-588).

Unlike the reference, FK here is one vectorized function over all frames —
`fk_all(q) -> (F, 4, 4)` — from which every per-link accessor slices; all
accessors broadcast over leading batch axes of `q`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.models.kinematics import KinematicModel
from grasptrajopt_tpu.models.urdf import (
    Urdf,
    UrdfJoint,
    UrdfLink,
    parse_urdf_file,
    parse_urdf_string,
)
from grasptrajopt_tpu.spatial import invt, r2quat, r2rpy

_BIG = 1e9


class Model:
    """Named state block with time-derivative orders and limits.

    Parity: optas/models.py:79 (Model) — the naming scheme
    `{name}/{d*}{symbol}` survives in our solution dictionaries.
    """

    def __init__(self, name, dim, time_derivs, symbol, dlim, T=None, is_discrete=False):
        self.name = name
        self.dim = dim
        self.time_derivs = list(time_derivs)
        self.symbol = symbol
        self.dlim = dlim
        self.T = T
        self.is_discrete = is_discrete

    def get_name(self):
        return self.name

    def state_name(self, time_deriv: int) -> str:
        return self.name + "/" + "d" * time_deriv + self.symbol

    def state_optimized_name(self, time_deriv: int) -> str:
        return self.state_name(time_deriv) + "/x"

    def state_parameter_name(self, time_deriv: int) -> str:
        return self.state_name(time_deriv) + "/p"

    def get_limits(self, time_deriv: int):
        assert time_deriv in self.dlim, (
            f"limit for time derivative {time_deriv} not specified for model '{self.name}'"
        )
        return self.dlim[time_deriv]

    def in_limit(self, x, time_deriv: int):
        lo, up = self.get_limits(time_deriv)
        return jnp.logical_and(jnp.all(x >= lo), jnp.all(x <= up))


class TaskModel(Model):
    """Generic task state (e.g. the mobile base (x, y, theta) variable).

    Parity: optas/models.py:189; used by the base planner the way
    gto/base_planner.py:23 uses it.
    """

    def __init__(self, name, dim, time_derivs=[0], symbol="y", dlim={}, T=None, is_discrete=False):
        super().__init__(name, dim, time_derivs, symbol, dlim, T, is_discrete)


class RobotModel(Model):
    """URDF-backed robot with batched FK and the optimized/parameter joint split."""

    def __init__(
        self,
        urdf_filename: Optional[str] = None,
        urdf_string: Optional[str] = None,
        name: Optional[str] = None,
        time_derivs: Sequence[int] = (0,),
        qddlim=None,
        T: Optional[int] = None,
        param_joints: Sequence[str] = (),
        dtype=jnp.float32,
        xacro_filename: Optional[str] = None,
    ):
        if xacro_filename is not None or (
            urdf_filename is not None and urdf_filename.endswith(".xacro")
        ):
            # xacro -> URDF preprocessing (parity: optas/models.py:261-267)
            from grasptrajopt_tpu.models.xacro import process_xacro_file

            self.urdf_filename = xacro_filename or urdf_filename
            self.urdf = parse_urdf_string(process_xacro_file(self.urdf_filename))
        elif urdf_filename is not None:
            self.urdf_filename = urdf_filename
            self.urdf = parse_urdf_file(urdf_filename)
        elif urdf_string is not None:
            self.urdf_filename = None
            self.urdf = parse_urdf_string(urdf_string)
        else:
            raise ValueError("supply a URDF via filename or string")

        self.param_joints = list(param_joints)
        self.dtype = dtype
        self._compile()

        dlim = {
            0: (self.lower_optimized_joint_limits, self.upper_optimized_joint_limits),
            1: (
                -self.velocity_optimized_joint_limits,
                self.velocity_optimized_joint_limits,
            ),
        }
        if qddlim is not None:
            qddlim = np.broadcast_to(np.asarray(qddlim, dtype=np.float64), (self.ndof,))
            dlim[2] = (-qddlim, qddlim)

        super().__init__(name or self.urdf.name, self.ndof, time_derivs, "q", dlim, T)

    # -- kinematic compilation ------------------------------------------------

    def _compile(self) -> None:
        self.kinematics = KinematicModel(self.urdf)
        self._fk_all = jax.jit(self.kinematics.fk_fn(dtype=self.dtype))
        self._fk_components = self.kinematics.fk_components_fn(dtype=self.dtype)

    def get_urdf(self) -> Urdf:
        return self.urdf

    # -- joint bookkeeping ----------------------------------------------------

    @property
    def joint_names(self) -> List[str]:
        return [j.name for j in self.urdf.joints]

    @property
    def link_names(self) -> List[str]:
        return [l.name for l in self.urdf.links]

    @property
    def actuated_joint_names(self) -> List[str]:
        return self.kinematics.actuated_joint_names

    @property
    def ndof(self) -> int:
        return len(self.actuated_joint_names)

    def get_actuated_joint_index(self, joint_name: str) -> int:
        return self.actuated_joint_names.index(joint_name)

    @property
    def parameter_joint_names(self) -> List[str]:
        return [j for j in self.actuated_joint_names if j in self.param_joints]

    @property
    def optimized_joint_names(self) -> List[str]:
        return [j for j in self.actuated_joint_names if j not in self.parameter_joint_names]

    @property
    def optimized_joint_indexes(self) -> List[int]:
        return [self.get_actuated_joint_index(j) for j in self.optimized_joint_names]

    @property
    def parameter_joint_indexes(self) -> List[int]:
        return [self.get_actuated_joint_index(j) for j in self.parameter_joint_names]

    @property
    def num_opt_joints(self) -> int:
        return len(self.optimized_joint_names)

    @property
    def num_param_joints(self) -> int:
        return len(self.parameter_joint_names)

    def extract_optimized_dimensions(self, values):
        """Select the optimized-joint rows of an (ndof, ...) array."""
        return jnp.asarray(values)[jnp.asarray(self.optimized_joint_indexes, dtype=int)]

    def extract_parameter_dimensions(self, values):
        """Select the parameter-joint rows of an (ndof, ...) array."""
        idx = self.parameter_joint_indexes
        vals = jnp.asarray(values)
        if not idx:
            return jnp.zeros((0,) + vals.shape[1:], dtype=vals.dtype)
        return vals[jnp.asarray(idx, dtype=int)]

    def assemble_q(self, q_opt, q_param):
        """Scatter optimized + parameter values back into full-(..., ndof) order.

        Inverse of the extract_* pair; parity with the solution re-merge at
        optas/solver.py:138-157 and builder.py:179-205.
        """
        q_opt = jnp.asarray(q_opt)
        batch = q_opt.shape[:-1]
        out = jnp.zeros(batch + (self.dim,), dtype=q_opt.dtype)
        out = out.at[..., jnp.asarray(self.optimized_joint_indexes, dtype=int)].set(q_opt)
        if self.num_param_joints:
            out = out.at[..., jnp.asarray(self.parameter_joint_indexes, dtype=int)].set(q_param)
        return out

    # -- limits ---------------------------------------------------------------

    def _limit_array(self, names: List[str], field: str, default: float) -> np.ndarray:
        vals = []
        for jname in names:
            j = self.urdf.joint_map[jname]
            v = getattr(j.limit, field, None) if j.limit is not None else None
            vals.append(default if v is None else v)
        return np.asarray(vals, dtype=np.float64)

    @property
    def lower_actuated_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.actuated_joint_names, "lower", -_BIG)

    @property
    def upper_actuated_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.actuated_joint_names, "upper", _BIG)

    @property
    def velocity_actuated_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.actuated_joint_names, "velocity", _BIG)

    @property
    def lower_optimized_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.optimized_joint_names, "lower", -_BIG)

    @property
    def upper_optimized_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.optimized_joint_names, "upper", _BIG)

    @property
    def velocity_optimized_joint_limits(self) -> np.ndarray:
        return self._limit_array(self.optimized_joint_names, "velocity", _BIG)

    # -- forward kinematics ---------------------------------------------------

    def fk_all(self, q):
        """World transform of every frame: q (..., ndof) -> (..., F, 4, 4)."""
        return self._fk_all(jnp.asarray(q, dtype=self.dtype))

    def fk_components(self, q):
        """Component-form FK: (R as 3x3 nested lists of (..., F), t as 3
        list of (..., F)) — the layout-clean fast path for hot loops (see
        KinematicModel.fk_components_fn)."""
        return self._fk_components(jnp.asarray(q, dtype=self.dtype))

    @staticmethod
    def frame_matrix(comps, frame_idx: int):
        """Assemble the (..., 4, 4) matrix of ONE frame from components."""
        AR, At = comps
        rows = []
        for i in range(3):
            rows.append(
                jnp.stack(
                    [AR[i][0][..., frame_idx], AR[i][1][..., frame_idx],
                     AR[i][2][..., frame_idx], At[i][..., frame_idx]],
                    axis=-1,
                )
            )
        bottom = jnp.zeros_like(rows[0]).at[..., 3].set(1.0)
        return jnp.stack(rows + [bottom], axis=-2)

    def frame_of(self, link: str) -> int:
        return self.kinematics.frame_of(link)

    def get_global_link_transform(self, link: str, q):
        """T_world_link for q of shape (..., ndof) -> (..., 4, 4).

        Parity: optas/models.py:828-868 (chain walk), here a slice of the
        vectorized all-frames FK.
        """
        return self.fk_all(q)[..., self.frame_of(link), :, :]

    def get_global_link_transform_function(self, link: str, n: int = 1):
        """Returns fn(Q) with Q of shape (ndof,) or (ndof, n) -> (n, 4, 4).

        Mirrors the reference's column-stacked trajectory convention
        (optas/models.py:729-824 make_function / .map(n)).
        """
        f = self.frame_of(link)

        def fn(Q):
            Q = jnp.asarray(Q, dtype=self.dtype)
            if Q.ndim == 1:
                return self.fk_all(Q)[f]
            return self.fk_all(Q.T)[..., f, :, :]

        return fn

    def get_link_transform(self, link: str, q, base_link: str):
        """T_baselink_link = inv(T_world_base) @ T_world_link."""
        frames = self.fk_all(q)
        T_l = frames[..., self.frame_of(link), :, :]
        T_b = frames[..., self.frame_of(base_link), :, :]
        return invt(T_b) @ T_l

    def get_link_transform_function(self, link: str, base_link: str, n: int = 1):
        fl, fb = self.frame_of(link), self.frame_of(base_link)

        def fn(Q):
            Q = jnp.asarray(Q, dtype=self.dtype)
            if Q.ndim == 1:
                frames = self.fk_all(Q)
                return invt(frames[fb]) @ frames[fl]
            frames = self.fk_all(Q.T)
            return invt(frames[..., fb, :, :]) @ frames[..., fl, :, :]

        return fn

    def get_global_link_position(self, link: str, q):
        return self.get_global_link_transform(link, q)[..., :3, 3]

    def get_global_link_rotation(self, link: str, q):
        return self.get_global_link_transform(link, q)[..., :3, :3]

    def get_global_link_quaternion(self, link: str, q):
        """xyzw quaternion FK. Parity: optas/models.py:1055-1092."""
        return r2quat(self.get_global_link_rotation(link, q))

    def get_global_link_rpy(self, link: str, q):
        """RPY FK. Parity: optas/models.py:1154."""
        return r2rpy(self.get_global_link_rotation(link, q))

    # -- Jacobians ------------------------------------------------------------

    def get_global_link_geometric_jacobian(self, link: str, q):
        """Geometric Jacobian (6, ndof): rows [v; w] in the world frame.

        Built from the all-frames FK: for each actuated joint ancestor of
        `link`, v-column = z x (p_link - p_joint) (revolute) or z (prismatic),
        w-column = z (revolute) or 0. Parity: optas/models.py:1205-1268.
        """
        q = jnp.asarray(q, dtype=self.dtype)
        frames = self.fk_all(q)
        kin = self.kinematics
        f_link = self.frame_of(link)

        # Host-side: which actuated joint lives at each ancestor frame of link.
        cols_joint = []
        cols_frame = []
        f = f_link
        while f != 0:
            if kin.joint_index[f] >= 0:
                cols_joint.append(int(kin.joint_index[f]))
                cols_frame.append(f)
            f = int(kin.parent[f])

        p_link = frames[..., f_link, :3, 3]
        J = jnp.zeros(q.shape[:-1] + (6, self.ndof), dtype=self.dtype)
        for jidx, fidx in zip(cols_joint, cols_frame):
            R = frames[..., fidx, :3, :3]
            axis = jnp.asarray(kin.axis[fidx], dtype=self.dtype)
            z = R @ axis
            p = frames[..., fidx, :3, 3]
            if kin.joint_type[fidx] == 1:  # revolute
                v = jnp.cross(z, p_link - p)
                w = z
            else:  # prismatic
                v = z
                w = jnp.zeros_like(z)
            J = J.at[..., :3, jidx].set(v)
            J = J.at[..., 3:, jidx].set(w)
        return J

    def get_global_link_linear_jacobian(self, link: str, q):
        return self.get_global_link_geometric_jacobian(link, q)[..., :3, :]

    def get_global_link_angular_geometric_jacobian(self, link: str, q):
        return self.get_global_link_geometric_jacobian(link, q)[..., 3:, :]

    def get_global_link_analytical_jacobian(self, link: str, q):
        """Analytical Jacobian: d[p; rpy]/dq via autodiff.

        Parity: optas/models.py:1289,1596-1615 (cs.jacobian of the RPY FK).
        """
        def pose(qq):
            T = self.get_global_link_transform(link, qq)
            return jnp.concatenate([T[:3, 3], r2rpy(T[:3, :3])])

        return jax.jacfwd(pose)(jnp.asarray(q, dtype=self.dtype))

    def get_link_axis(self, link: str, q, axis: str):
        """World direction of a link-frame axis. Parity: optas/models.py:1643."""
        col = {"x": 0, "y": 1, "z": 2}[axis]
        return self.get_global_link_rotation(link, q)[..., :, col]

    # -- sampling & re-rooting ------------------------------------------------

    def get_random_joint_positions(self, key, n: int = 1, lo=None, hi=None):
        """Uniform random configurations within (clipped) limits.

        Parity: optas/models.py:669-718; limits are clipped to ±10 rad where
        the URDF leaves them unbounded so sampling stays finite.
        """
        lo = np.clip(self.lower_actuated_joint_limits if lo is None else lo, -10.0, 10.0)
        hi = np.clip(self.upper_actuated_joint_limits if hi is None else hi, -10.0, 10.0)
        u = jax.random.uniform(key, (n, self.ndof), dtype=self.dtype)
        return jnp.asarray(lo, self.dtype) + u * jnp.asarray(hi - lo, self.dtype)

    def rnea(self, q, qd, qdd, gravity=(0.0, 0.0, -9.81)):
        """Inverse dynamics tau = M qdd + C qd + g.

        Parity: optas/models.py:1736-1888 — computed here from the
        Lagrangian with autodiff over the batched FK (see models/dynamics),
        which lifts the reference's serial-revolute-chain restriction.
        """
        from grasptrajopt_tpu.models.dynamics import make_inverse_dynamics

        if not hasattr(self, "_idyn_cache") or self._idyn_cache[0] != tuple(gravity):
            self._idyn_cache = (tuple(gravity), jax.jit(make_inverse_dynamics(self, gravity)))
        return self._idyn_cache[1](q, qd, qdd)

    def add_base_frame(self, base_link: str, xyz=None, rpy=None, joint_name=None) -> None:
        """Re-root the model under a new fixed base frame.

        Parity: optas/models.py:552-588.
        """
        current_root = self.urdf.get_root()
        if joint_name is None:
            joint_name = f"{base_link}_and_{current_root}_joint"
        self.urdf.add_link(UrdfLink(name=base_link))
        self.urdf.add_joint(
            UrdfJoint(
                name=joint_name,
                type="fixed",
                parent=base_link,
                child=current_root,
                xyz=tuple(xyz) if xyz is not None else (0.0, 0.0, 0.0),
                rpy=tuple(rpy) if rpy is not None else (0.0, 0.0, 0.0),
            )
        )
        self._compile()
