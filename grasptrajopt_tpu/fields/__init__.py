"""Perception-side geometry: voxel cost fields, depth-camera point clouds,
mesh surface point clouds with SDF queries.

Replaces the reference's mesh_to_sdf package (KD-tree SDF queries,
/root/reference/mesh_to_sdf/) with on-device brute-force distance fields and
host-side parity APIs for asset preparation.
"""

from grasptrajopt_tpu.fields.voxel_grid import VoxelGrid, OccupancyGrid2D
from grasptrajopt_tpu.fields.depth_point_cloud import (
    DepthPointCloud,
    FusedDepthPointCloud,
)
from grasptrajopt_tpu.fields.surface_point_cloud import (
    SurfacePointCloud,
    get_surface_point_cloud,
    mesh_to_sdf,
    mesh_to_voxels,
    sample_sdf_near_surface,
)
from grasptrajopt_tpu.fields.scene_points import (
    ScenePointSet,
    downsample_scene,
    scene_point_sets_from_depth,
)
from grasptrajopt_tpu.fields.sdf_program import make_sdf_program, sdf_value_jac_hess

__all__ = [
    "ScenePointSet",
    "downsample_scene",
    "scene_point_sets_from_depth",
    "make_sdf_program",
    "sdf_value_jac_hess",
    "VoxelGrid",
    "OccupancyGrid2D",
    "DepthPointCloud",
    "FusedDepthPointCloud",
    "SurfacePointCloud",
    "get_surface_point_cloud",
    "mesh_to_sdf",
    "mesh_to_voxels",
    "sample_sdf_near_surface",
]
