"""Differentiable SDF field program: value / Jacobian / Hessian.

The reference ships (but never wires up) a CasADi Callback exposing a voxel
SDF as a custom differentiable function with hand-written central-difference
Jacobian and Hessian callbacks (/root/reference/gto/sdf_callback.py:4-183 —
dead code; the shipped planners index the field with zero-gradient floor
offsets instead). Here the same capability is native: the trilinear field
lookup IS differentiable, and `jax.grad`/`jax.hessian` provide exact
derivatives of the interpolant — no finite differences, no callback
machinery. This module packages that as an explicit (f, J, H) function
triple for users who want the reference's SDFCallback interface.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.fields.voxel_grid import VoxelGrid


def make_sdf_program(grid: VoxelGrid, field_flat) -> Tuple[Callable, Callable, Callable]:
    """Returns (value_fn, jac_fn, hess_fn) over a single 3-point.

    value_fn(p: (3,)) -> scalar trilinear field value
    jac_fn(p)         -> (3,) exact gradient of the interpolant
    hess_fn(p)        -> (3, 3) exact Hessian (piecewise-bilinear mixed
                         terms; zero pure second derivatives inside a cell)
    All three are jit/vmap-safe; batch with jax.vmap.
    """
    field = jnp.asarray(field_flat)

    def value_fn(p):
        return grid.lookup_trilinear(field, p[None])[0]

    jac_fn = jax.grad(value_fn)
    hess_fn = jax.hessian(value_fn)
    return value_fn, jac_fn, hess_fn


def sdf_value_jac_hess(grid: VoxelGrid, field_flat, points):
    """Batched (values (N,), jacobians (N, 3), hessians (N, 3, 3))."""
    value_fn, jac_fn, hess_fn = make_sdf_program(grid, field_flat)
    points = jnp.asarray(points)
    return (
        jax.vmap(value_fn)(points),
        jax.vmap(jac_fn)(points),
        jax.vmap(hess_fn)(points),
    )
