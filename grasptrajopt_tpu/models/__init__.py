"""Robot modeling: URDF parsing, flat kinematic pytrees, batched FK.

Replaces the reference's urdf_parser_py + CasADi chain-walk FK
(/root/reference/optas/models.py) with a first-party parser and a
shape-static, jit/vmap-friendly kinematics compiler.
"""

from grasptrajopt_tpu.models.urdf import Urdf, UrdfJoint, UrdfLink, parse_urdf_file, parse_urdf_string
from grasptrajopt_tpu.models.kinematics import KinematicModel
from grasptrajopt_tpu.models.robot import RobotModel, TaskModel

__all__ = [
    "Urdf",
    "UrdfJoint",
    "UrdfLink",
    "parse_urdf_file",
    "parse_urdf_string",
    "KinematicModel",
    "RobotModel",
    "TaskModel",
]
