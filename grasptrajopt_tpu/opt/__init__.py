"""Optimization core: batched on-device NLP solvers.

This subsystem replaces the reference's entire CasADi/Ipopt stack
(/root/reference/optas/{builder,optimization,solver}.py + the vendored
Ipopt interior-point solver). The architectural shift:

  reference: build a fresh symbolic NLP graph per problem instance, hand it
             to a C++ interior-point solver on the host (~100 iterations,
             ~10 s per plan, one problem at a time)

  here:      ONE jit-compiled solver program with fixed iteration budget;
             problem instances are pytrees of parameters; `vmap` batches
             thousands of independent (scene x grasp-set x seed) solves;
             equality constraints (initial state, Euler dynamics) are
             eliminated structurally so only box constraints remain,
             handled by projection inside the line search.

Solvers:
  - solve_box_lm / make_box_lm_solver: dense projected Levenberg-Marquardt
    for small problems (IK screens, base-pose placement).
  - make_trajectory_solver: block-tridiagonal projected LM over a time
    axis — the grasp-trajectory workhorse (see opt/trajectory.py).
  - scipy_oracle: SciPy SLSQP adapter used as the ground-truth oracle in
    tests (the reference's own cross-check pattern, examples/planar_ik.py).
"""

from grasptrajopt_tpu.opt.lm import make_box_lm_solver, solve_box_lm
from grasptrajopt_tpu.opt.trajectory import (
    TrajectoryConfig,
    make_trajectory_solver,
)
from grasptrajopt_tpu.opt.layout import BlockLayout
from grasptrajopt_tpu.opt.builder import OptimizationBuilder
from grasptrajopt_tpu.opt.taxonomy import Optimization
from grasptrajopt_tpu.opt.al_sqp import ALSQPConfig, make_al_sqp_solver
from grasptrajopt_tpu.opt.qp import ADMMConfig, solve_qp_admm
from grasptrajopt_tpu.opt.solver import (
    ADMMQPSolver,
    ALSQPSolver,
    ScipyMinimizeSolver,
    Solver,
)

__all__ = [
    "make_box_lm_solver",
    "solve_box_lm",
    "TrajectoryConfig",
    "make_trajectory_solver",
    "BlockLayout",
    "OptimizationBuilder",
    "Optimization",
    "ALSQPConfig",
    "make_al_sqp_solver",
    "ADMMConfig",
    "solve_qp_admm",
    "Solver",
    "ALSQPSolver",
    "ADMMQPSolver",
    "ScipyMinimizeSolver",
]
