"""SO(3)/SE(3)/quaternion operations as pure jnp functions.

Functional replacement for the reference's CasADi-expression spatial math
(/root/reference/optas/spatialmath.py). Everything here is shape-polymorphic
over leading batch axes, dtype-polymorphic, jit/vmap/grad-safe.
"""

from grasptrajopt_tpu.spatial.se3 import (
    angvec2r,
    invt,
    r2rpy,
    rotx,
    roty,
    rotz,
    rpy2r,
    rt2tr,
    skew,
    standoff,
    tr2rt,
    transform_points,
    transform_directions,
)
from grasptrajopt_tpu.spatial.quaternion import (
    qangle_deg,
    qconj,
    qmul,
    quat2r,
    r2quat,
    rotation_angle_deg,
)

__all__ = [
    "angvec2r",
    "invt",
    "r2rpy",
    "rotx",
    "roty",
    "rotz",
    "rpy2r",
    "rt2tr",
    "skew",
    "standoff",
    "tr2rt",
    "transform_points",
    "transform_directions",
    "qangle_deg",
    "qconj",
    "qmul",
    "quat2r",
    "r2quat",
    "rotation_angle_deg",
]
