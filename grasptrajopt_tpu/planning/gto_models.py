"""GTORobotModel: robot as link-surface point clouds + voxel cost fields.

Functional parity with /root/reference/gto/gto_models.py: per-link surface
point clouds restricted to `collision_link_names` (100 pts/link via
area-weighted mesh sampling, :62-80), visual-frame FK of all surface points
(:83-132), workspace / scene-bounds voxel fields (:135-171, margin 0.4 m,
resolution 0.05 m :45-46), point->offset maps (:174-201), plan cost
(:204-215), 2-D occupancy grid for base planning (:219-292), standoff pose
(:49-59).

TPU redesign: surface points are pre-transformed into link frames once
(visual origin folded in), so runtime FK of all ~1.2k body points is a
dozen batched (N,3)x(3,3) transforms off one all-frames FK call —
`fk_surface_points` broadcasts over arbitrary batch/time axes in one jit.
"""

from __future__ import annotations

import os
import zlib
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.fields.surface_point_cloud import SurfacePointCloud
from grasptrajopt_tpu.fields.voxel_grid import OccupancyGrid2D, VoxelGrid
from grasptrajopt_tpu.models.mesh import geometry_mesh
from grasptrajopt_tpu.models.robot import RobotModel
from grasptrajopt_tpu.ops import min_sqdist
from grasptrajopt_tpu.spatial import transform_points


class GTORobotModel(RobotModel):
    def __init__(
        self,
        model_dir: str,
        urdf_filename: Optional[str] = None,
        urdf_string: Optional[str] = None,
        name: Optional[str] = None,
        time_derivs: Sequence[int] = (0,),
        qddlim=None,
        T: Optional[int] = None,
        param_joints: Sequence[str] = (),
        collision_link_names: Optional[List[str]] = None,
        points_per_link: int = 100,
        grid_resolution: float = 0.05,
        dtype=jnp.float32,
    ):
        super().__init__(
            urdf_filename=urdf_filename,
            urdf_string=urdf_string,
            name=name,
            time_derivs=time_derivs,
            qddlim=qddlim,
            T=T,
            param_joints=param_joints,
            dtype=dtype,
        )
        self.model_dir = model_dir
        self.collision_link_names = collision_link_names
        self.points_per_link = points_per_link
        self.field_margin = 0.4
        # reference parity default 0.05 m (gto/gto_models.py:45-46). The
        # reference is pinned to 5 cm by CPU field-build cost; here it is a
        # fidelity knob — thin-object clearance in shelf scenes needs finer
        # sampling than the 2 cm cost band allows at 5 cm voxels (the band
        # is below the grid's Nyquist rate; docs/PERF.md shelf study).
        self.grid_resolution = float(grid_resolution)

        self.surface_pc_map: Dict[str, SurfacePointCloud] = self.compute_link_surface_points()
        self._stack_surface_points()

        self.grid: Optional[VoxelGrid] = None
        self.occupancy: Optional[OccupancyGrid2D] = None
        self.occupancy_grid: Optional[np.ndarray] = None

    # -- surface point model --------------------------------------------------

    def compute_link_surface_points(self) -> Dict[str, SurfacePointCloud]:
        """Sample each (collision) link's visual mesh surface.

        Parity: gto_models.py:62-80 — links without a visual are skipped;
        when `collision_link_names` is given only those links get points.
        Sampling is deterministic (seeded per link name).
        """
        out: Dict[str, SurfacePointCloud] = {}
        for link in self.urdf.links:
            visual = link.visual
            if visual is None:
                continue
            if self.collision_link_names is not None and link.name not in self.collision_link_names:
                continue
            mesh = geometry_mesh(visual.geometry, self.model_dir)
            if mesh is None:
                continue
            seed = zlib.crc32(link.name.encode())
            points, normals = mesh.sample_surface(self.points_per_link, seed=seed)
            out[link.name] = SurfacePointCloud(mesh, points, normals)
        return out

    def _stack_surface_points(self) -> None:
        """Fold visual origins into link-frame point arrays and stack."""
        self._surface_links: List[str] = list(self.surface_pc_map.keys())
        self._surface_frame_idx: List[int] = []
        self._link_points_local: List[jnp.ndarray] = []
        self._link_normals_local: List[jnp.ndarray] = []
        self._visual_offsets: Dict[str, np.ndarray] = {}
        from grasptrajopt_tpu.models.kinematics import _host_rt2tr

        for name in self._surface_links:
            link = self.urdf.link_map[name]
            visual = link.visual
            V = _host_rt2tr(visual.rpy, visual.xyz)
            self._visual_offsets[name] = V
            pc = self.surface_pc_map[name]
            pts = pc.points @ V[:3, :3].T + V[:3, 3]
            nrm = pc.normals @ V[:3, :3].T
            self._surface_frame_idx.append(self.frame_of(name))
            self._link_points_local.append(jnp.asarray(pts, self.dtype))
            self._link_normals_local.append(jnp.asarray(nrm, self.dtype))
        self.num_surface_points = int(sum(p.shape[0] for p in self._link_points_local))
        # SoA locals for the component-FK fast path: per link, per axis (Pl,)
        self._link_points_soa = [
            [jnp.asarray(np.asarray(p)[:, i], self.dtype) for i in range(3)]
            for p in self._link_points_local
        ]

    def visual_tf(self, link_name: str, q):
        """World transform of a link's visual frame (parity:
        gto_models.py:83-101 setup_fk_functions)."""
        T_link = self.get_global_link_transform(link_name, q)
        V = jnp.asarray(self._visual_offsets[link_name], self.dtype)
        return T_link @ V

    def fk_surface_points(self, q, tf_base=None, base_position=None):
        """All body surface points in the world frame.

        q: (..., ndof) -> points (..., P, 3). Optionally composes a base
        transform or adds a base translation (the planners' convention,
        gto_planner.py:116).
        """
        frames = self.fk_all(q)
        outs = []
        for fidx, pts in zip(self._surface_frame_idx, self._link_points_local):
            T = frames[..., fidx, :, :]
            if tf_base is not None:
                T = jnp.asarray(tf_base, self.dtype) @ T
            outs.append(transform_points(T, pts))
        world = jnp.concatenate(outs, axis=-2)
        if base_position is not None:
            world = world + jnp.asarray(base_position, self.dtype)
        return world

    def surface_points_soa(self, comps, base_position=None, stride: int = 1):
        """World surface points in SoA form from component FK.

        comps: output of `fk_components(q)`. Returns (x, y, z), each
        (..., P). Per link the world coordinate is a scalar-broadcast
        multiply-add over the (Pl,) local coordinates — pure elementwise
        VPU work with no (..., P, 3) or 4x4 intermediates, which is what
        keeps the hot residual path off XLA's padded-tile layouts.

        stride > 1 keeps every stride-th point per link (a uniform
        surface subsample — the per-link samples are already i.i.d. area
        weighted): the coarse-fidelity obstacle phase of the trajectory
        solver evaluates its early iterations on this subset."""
        AR, At = comps
        outs = [[], [], []]
        for fidx, (px, py, pz) in zip(self._surface_frame_idx, self._link_points_soa):
            if stride > 1:
                px, py, pz = px[::stride], py[::stride], pz[::stride]
            for i in range(3):
                w = (
                    AR[i][0][..., fidx, None] * px
                    + AR[i][1][..., fidx, None] * py
                    + AR[i][2][..., fidx, None] * pz
                    + At[i][..., fidx, None]
                )
                outs[i].append(w)
        x, y, z = (jnp.concatenate(o, axis=-1) for o in outs)
        if base_position is not None:
            b = jnp.asarray(base_position, self.dtype)
            x = x + b[..., 0, None]
            y = y + b[..., 1, None]
            z = z + b[..., 2, None]
        return x, y, z

    def compute_fk_surface_points(self, q, tf_base=None):
        """Reference-parity API returning (points (P,3), normals (P,3)) as
        numpy (gto_models.py:104-121)."""
        frames = self.fk_all(q)
        pts_out, nrm_out = [], []
        for fidx, pts, nrm in zip(
            self._surface_frame_idx, self._link_points_local, self._link_normals_local
        ):
            T = frames[..., fidx, :, :]
            if tf_base is not None:
                T = jnp.asarray(tf_base, self.dtype) @ T
            pts_out.append(transform_points(T, pts))
            nrm_out.append(nrm @ jnp.swapaxes(T[..., :3, :3], -1, -2))
        return (
            np.asarray(jnp.concatenate(pts_out, axis=-2)),
            np.asarray(jnp.concatenate(nrm_out, axis=-2)),
        )

    def compute_fk_link_surface_points(self, q, name: str, tf_base=None):
        T = self.visual_tf(name, q)
        if tf_base is not None:
            T = jnp.asarray(tf_base, self.dtype) @ T
        pc = self.surface_pc_map[name]
        return np.asarray(transform_points(T, jnp.asarray(pc.points, self.dtype)))

    def get_standoff_pose(self, offset: float, axis: str) -> np.ndarray:
        """Parity: gto_models.py:49-59."""
        pose = np.eye(4, dtype=np.float32)
        index = {"x": 0, "y": 1, "z": 2}.get(axis)
        if index is None:
            print("unknown standoff axis", axis)
        else:
            pose[index, 3] = offset
        return pose

    # -- voxel fields ---------------------------------------------------------

    def setup_workspace_field(self, arm_len: float, arm_height: float) -> VoxelGrid:
        self.grid = VoxelGrid.from_workspace(
            arm_len, arm_height, margin=self.field_margin, resolution=self.grid_resolution
        )
        return self.grid

    def setup_points_field(self, points) -> VoxelGrid:
        self.grid = VoxelGrid.from_points(
            np.asarray(points), margin=self.field_margin, resolution=self.grid_resolution
        )
        return self.grid

    @property
    def field_shape(self):
        return self.grid.shape

    @property
    def field_size(self) -> int:
        return self.grid.size

    @property
    def origin(self) -> np.ndarray:
        return np.asarray(self.grid.origin).reshape(1, 3)

    @property
    def workspace_points(self) -> np.ndarray:
        return self.grid.grid_points()

    def points_to_offsets(self, points):
        return self.grid.offsets(points)

    def points_to_offsets_numpy(self, points) -> np.ndarray:
        return np.asarray(self.grid.offsets(jnp.asarray(points, self.dtype)))

    def compute_plan_cost(self, plan, sdf_cost, base_position):
        """Accumulated (nearest-cell) obstacle cost of a plan + start-goal
        distance. Parity: gto_models.py:204-215; used to rank warm starts."""
        plan = jnp.asarray(plan, self.dtype)  # (ndof, T)
        Q = plan.T
        pts = self.fk_surface_points(Q, base_position=jnp.asarray(base_position, self.dtype))
        vals = self.grid.lookup_nearest(jnp.asarray(sdf_cost, self.dtype), pts)
        cost = jnp.sum(vals)
        dist = jnp.linalg.norm(plan[:, 0] - plan[:, -1])
        return float(cost), float(dist)

    # -- occupancy (mobile base) ----------------------------------------------

    def setup_occupancy_grid(self, points, epsilon: float = 0.02) -> OccupancyGrid2D:
        """2-D occupancy from scene points with z > 0.01 (parity:
        gto_models.py:219-244), built with the on-device NN kernel."""
        points = np.asarray(points)
        xys = points[points[:, 2] > 0.01][:, :2]
        self.occupancy = OccupancyGrid2D.from_points_bounds(
            xys, margin=self.field_margin, resolution=self.grid_resolution
        )
        gp = self.occupancy.grid_points()
        q3 = np.concatenate([gp, np.zeros((gp.shape[0], 1), gp.dtype)], axis=1)
        r3 = np.concatenate([xys, np.zeros((xys.shape[0], 1))], axis=1)
        d2, _ = min_sqdist(jnp.asarray(q3, self.dtype), jnp.asarray(r3, self.dtype))
        self.occupancy_grid = (np.sqrt(np.asarray(d2)) < epsilon).astype(np.float64)
        return self.occupancy

    @property
    def occupancy_grid_shape(self):
        return self.occupancy.shape

    @property
    def occupancy_grid_size(self) -> int:
        return self.occupancy.size

    @property
    def occupancy_grid_origin(self) -> np.ndarray:
        return np.asarray(self.occupancy.origin).reshape(1, 2)

    def points_to_offsets_occupancy(self, points):
        return self.occupancy.offsets(jnp.asarray(points)[..., :2])

    def points_to_offsets_occupancy_numpy(self, points) -> np.ndarray:
        return np.asarray(self.points_to_offsets_occupancy(points))

    def occupancy_cost(self, q, tf_base_inv, occupancy_grid):
        """Occupied-cell count under the robot at a candidate base pose
        (parity: setup_occupancy_grid_function, gto_models.py:275-292)."""
        pts = self.fk_surface_points(q, tf_base=tf_base_inv)
        vals = self.occupancy.lookup(jnp.asarray(occupancy_grid), pts[..., :2])
        return jnp.sum(vals, axis=-1)
