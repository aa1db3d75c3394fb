"""GTO domain layer: grasp-trajectory planners over point-cloud robot models.

Re-implements the reference's gto/ package (GTORobotModel, IKSolver,
GTOPlanner, BasePlanner, utils) on the batched JAX solver core.
"""

from grasptrajopt_tpu.planning.gto_models import GTORobotModel
from grasptrajopt_tpu.planning.ik_solver import IKSolver
from grasptrajopt_tpu.planning.gto_planner import GTOPlanner
from grasptrajopt_tpu.planning.base_planner import BasePlanner

__all__ = ["GTORobotModel", "IKSolver", "GTOPlanner", "BasePlanner"]
