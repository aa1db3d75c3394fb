"""Simulation & benchmark environments (PyBullet SceneReplica harness).

This layer is the closed-loop evaluation side of the framework — the
host-side counterpart of the reference's examples/pybullet_*.py. PyBullet
is an optional dependency: the pure-math pieces (camera models, grasp
loading, the differential-drive controller, reward logic) import
unconditionally and are unit-tested; the simulator classes import only
when pybullet is installed.
"""

from grasptrajopt_tpu.envs.camera import (
    depth_from_ndc,
    pose_from_position_quaternion,
    projection_to_intrinsics,
    se3_inverse,
)
from grasptrajopt_tpu.envs.grasps import load_grasps, parse_grasps
from grasptrajopt_tpu.envs.controllers import PathFinderController, angle_mod, diff_drive_wheel_velocities

try:
    import pybullet  # noqa: F401

    HAS_PYBULLET = True
except ImportError:
    HAS_PYBULLET = False

if HAS_PYBULLET:
    from grasptrajopt_tpu.envs.pybullet_api import (  # noqa: F401
        Fetch,
        FixedBaseRobot,
        Panda,
        PyBulletSession,
    )
    from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv  # noqa: F401

__all__ = [
    "HAS_PYBULLET",
    "depth_from_ndc",
    "pose_from_position_quaternion",
    "projection_to_intrinsics",
    "se3_inverse",
    "load_grasps",
    "parse_grasps",
    "PathFinderController",
    "angle_mod",
    "diff_drive_wheel_velocities",
]
