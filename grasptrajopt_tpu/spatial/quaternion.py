"""Quaternion ops (scalar-last xyzw, matching the reference's optas convention).

Parity targets: the `Quaternion` class at /root/reference/optas/spatialmath.py:303
and the rotation-error metric used by the IK screen,
`arccos(2<q1,q2>^2 - 1) * 180/pi` (/root/reference/gto/ik_solver.py:97).
"""

from __future__ import annotations

import jax.numpy as jnp


def qconj(q):
    """Conjugate of xyzw quaternions (..., 4)."""
    q = jnp.asarray(q)
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def qmul(q1, q2):
    """Hamilton product of xyzw quaternions, broadcasting over batch axes."""
    q1 = jnp.asarray(q1)
    q2 = jnp.asarray(q2)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat2r(q):
    """xyzw quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = jnp.asarray(q)
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(norm, jnp.asarray(1e-12, q.dtype))
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack(
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            axis=-1,
        ),
        jnp.stack(
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            axis=-1,
        ),
        jnp.stack(
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            axis=-1,
        ),
    ]
    return jnp.stack(rows, axis=-2)


def r2quat(R):
    """Rotation matrix (..., 3, 3) -> xyzw quaternion (..., 4).

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the best-conditioned one with `where`, so it is
    safe under jit/vmap/grad (no data-dependent Python control flow).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    one = jnp.ones_like(tr)

    # Four candidates, each scaled by 4*component^2 (all non-negative).
    qw2 = jnp.maximum(one + tr, 0.0)
    qx2 = jnp.maximum(one + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(one - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(one - m00 - m11 + m22, 0.0)

    eps = jnp.asarray(1e-12, R.dtype)

    sw = jnp.sqrt(qw2 + eps)
    cand_w = jnp.stack([(m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
                        (m10 - m01) / (2 * sw), sw / 2], axis=-1)
    sx = jnp.sqrt(qx2 + eps)
    cand_x = jnp.stack([sx / 2, (m01 + m10) / (2 * sx),
                        (m02 + m20) / (2 * sx), (m21 - m12) / (2 * sx)], axis=-1)
    sy = jnp.sqrt(qy2 + eps)
    cand_y = jnp.stack([(m01 + m10) / (2 * sy), sy / 2,
                        (m12 + m21) / (2 * sy), (m02 - m20) / (2 * sy)], axis=-1)
    sz = jnp.sqrt(qz2 + eps)
    cand_z = jnp.stack([(m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz),
                        sz / 2, (m10 - m01) / (2 * sz)], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def qangle_deg(q1, q2):
    """Angle (degrees) between two xyzw quaternions: arccos(2<q1,q2>^2 - 1).

    Parity: the rotation-error metric at gto/ik_solver.py:97.
    """
    q1 = jnp.asarray(q1)
    q2 = jnp.asarray(q2)
    d = jnp.sum(q1 * q2, axis=-1)
    c = jnp.clip(2.0 * d * d - 1.0, -1.0, 1.0)
    return jnp.arccos(c) * (180.0 / jnp.pi)


def rotation_angle_deg(R1, R2):
    """Relative rotation angle (degrees) between rotation matrices."""
    return qangle_deg(r2quat(R1), r2quat(R2))
