"""Axis-aligned voxel grids for SDF cost fields and 2-D occupancy.

Grid construction parity with gto/gto_models.py:
  - from_workspace: xlim=[0, arm_len], ylim=[-arm_len, arm_len],
    zlim=[0, arm_height + arm_len], each padded by `margin`
    (setup_workspace_field, gto_models.py:135-152)
  - from_points: bounds of a scene point cloud padded by `margin`
    (setup_points_field, gto_models.py:155-171)
Defaults margin=0.4 m, resolution=0.05 m (gto_models.py:45-46). Axis sizes
use np.arange(lo, hi, res) semantics so `field_shape`/`field_size` match the
reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.ops import (
    field_lookup_nearest,
    field_lookup_trilinear,
    points_to_offsets,
)
from grasptrajopt_tpu.ops.interp import (
    field_lookup_trilinear_packed,
    pack_corners,
    points_to_offsets_2d,
)

DEFAULT_MARGIN = 0.4
DEFAULT_RESOLUTION = 0.05


@dataclass(frozen=True)
class VoxelGrid:
    origin: Tuple[float, float, float]
    shape: Tuple[int, int, int]
    resolution: float

    @classmethod
    def from_workspace(
        cls,
        arm_len: float,
        arm_height: float,
        margin: float = DEFAULT_MARGIN,
        resolution: float = DEFAULT_RESOLUTION,
    ) -> "VoxelGrid":
        xlim = (0.0, arm_len)
        ylim = (-arm_len, arm_len)
        zlim = (0.0, arm_height + arm_len)
        return cls._from_limits(xlim, ylim, zlim, margin, resolution)

    @classmethod
    def from_points(
        cls,
        points: np.ndarray,
        margin: float = DEFAULT_MARGIN,
        resolution: float = DEFAULT_RESOLUTION,
    ) -> "VoxelGrid":
        points = np.asarray(points)
        mins = points.min(axis=0)
        maxs = points.max(axis=0)
        return cls._from_limits(
            (mins[0], maxs[0]), (mins[1], maxs[1]), (mins[2], maxs[2]), margin, resolution
        )

    @classmethod
    def _from_limits(cls, xlim, ylim, zlim, margin, resolution) -> "VoxelGrid":
        axes = [
            np.arange(lim[0] - margin, lim[1] + margin, resolution)
            for lim in (xlim, ylim, zlim)
        ]
        origin = (float(axes[0][0]), float(axes[1][0]), float(axes[2][0]))
        shape = (len(axes[0]), len(axes[1]), len(axes[2]))
        return cls(origin=origin, shape=shape, resolution=float(resolution))

    @property
    def size(self) -> int:
        return self.shape[0] * self.shape[1] * self.shape[2]

    def grid_points(self, dtype=np.float32) -> np.ndarray:
        """All grid corner coordinates, row-major: (size, 3).

        Matches workspace_points (gto_models.py:141-148).
        """
        ii, jj, kk = np.meshgrid(
            np.arange(self.shape[0]),
            np.arange(self.shape[1]),
            np.arange(self.shape[2]),
            indexing="ij",
        )
        idx = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
        return (np.asarray(self.origin) + idx * self.resolution).astype(dtype)

    # -- lookups (device-side) ------------------------------------------------

    def offsets(self, points):
        return points_to_offsets(points, jnp.asarray(self.origin), self.shape, self.resolution)

    def lookup_nearest(self, field_flat, points):
        return field_lookup_nearest(
            field_flat, points, jnp.asarray(self.origin), self.shape, self.resolution
        )

    def lookup_trilinear(self, field_flat, points):
        return field_lookup_trilinear(
            field_flat, points, jnp.asarray(self.origin), self.shape, self.resolution
        )

    def lookup(self, field_flat, points, interp: str = "trilinear"):
        if interp == "trilinear":
            return self.lookup_trilinear(field_flat, points)
        if interp == "nearest":
            return self.lookup_nearest(field_flat, points)
        raise ValueError(f"unknown interp mode '{interp}'")

    def pack(self, field_flat, dtype=None):
        """Pack the 8 trilinear corners per cell: (size, 8). One contiguous
        row gather then serves each query (ops.interp.pack_corners).
        Passing dtype=jnp.bfloat16 halves the gather bytes — the eps-band
        cost values (<= ~0.1) lose < 0.4% relative precision."""
        packed = pack_corners(field_flat, self.shape)
        return packed.astype(dtype) if dtype is not None else packed

    def lookup_packed(self, packed, points, row_offset=0):
        return field_lookup_trilinear_packed(
            packed, points, jnp.asarray(self.origin), self.shape, self.resolution,
            row_offset=row_offset,
        )


@dataclass(frozen=True)
class OccupancyGrid2D:
    """2-D x-y occupancy grid for mobile-base placement.

    Build parity: setup_occupancy_grid (gto_models.py:219-244) — cells within
    `epsilon` of any scene point with z > 0.01 are occupied.
    """

    origin: Tuple[float, float]
    shape: Tuple[int, int]
    resolution: float

    @classmethod
    def from_points_bounds(
        cls,
        xys: np.ndarray,
        margin: float = DEFAULT_MARGIN,
        resolution: float = DEFAULT_RESOLUTION,
    ) -> "OccupancyGrid2D":
        xlim = (0.0, float(np.max(xys[:, 0])))
        ylim = (float(np.min(xys[:, 1])), float(np.max(xys[:, 1])))
        xgrid = np.arange(xlim[0] - margin, xlim[1] + margin, resolution)
        ygrid = np.arange(ylim[0] - margin, ylim[1] + margin, resolution)
        return cls(
            origin=(float(xgrid[0]), float(ygrid[0])),
            shape=(len(xgrid), len(ygrid)),
            resolution=float(resolution),
        )

    @property
    def size(self) -> int:
        return self.shape[0] * self.shape[1]

    def grid_points(self, dtype=np.float32) -> np.ndarray:
        ii, jj = np.meshgrid(np.arange(self.shape[0]), np.arange(self.shape[1]), indexing="ij")
        idx = np.stack([ii, jj], axis=-1).reshape(-1, 2)
        return (np.asarray(self.origin) + idx * self.resolution).astype(dtype)

    def offsets(self, points_xy):
        return points_to_offsets_2d(
            points_xy, jnp.asarray(self.origin), self.shape, self.resolution
        )

    def lookup(self, grid_flat, points_xy):
        return jnp.asarray(grid_flat)[self.offsets(points_xy)]
