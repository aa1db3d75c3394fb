"""Spatial math unit tests against scipy.spatial.transform as the oracle."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from grasptrajopt_tpu import spatial as sp

RNG = np.random.default_rng(0)


def random_rotations(n):
    return Rotation.random(n, random_state=42)


class TestRotations:
    def test_axis_rotations_match_scipy(self):
        thetas = RNG.uniform(-np.pi, np.pi, size=16)
        for axis, fn in [("x", sp.rotx), ("y", sp.roty), ("z", sp.rotz)]:
            want = Rotation.from_euler(axis, thetas[:, None]).as_matrix()
            got = np.asarray(fn(jnp.asarray(thetas)))
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rpy2r_matches_urdf_convention(self):
        rpy = RNG.uniform(-np.pi, np.pi, size=(32, 3))
        want = Rotation.from_euler("xyz", rpy).as_matrix()  # extrinsic xyz == Rz@Ry@Rx
        got = np.asarray(sp.rpy2r(jnp.asarray(rpy)))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_r2rpy_roundtrip(self):
        rpy = RNG.uniform(-1.4, 1.4, size=(32, 3))  # away from pitch singularity
        R = sp.rpy2r(jnp.asarray(rpy))
        back = np.asarray(sp.r2rpy(R))
        np.testing.assert_allclose(back, rpy, atol=1e-9)

    def test_angvec2r_matches_scipy(self):
        thetas = RNG.uniform(-np.pi, np.pi, size=16)
        axes = RNG.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        want = Rotation.from_rotvec(thetas[:, None] * axes).as_matrix()
        got = np.asarray(sp.angvec2r(jnp.asarray(thetas), jnp.asarray(axes)))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_angvec2r_zero_axis_is_identity(self):
        got = np.asarray(sp.angvec2r(jnp.asarray(0.3), jnp.zeros(3)))
        np.testing.assert_allclose(got, np.eye(3), atol=1e-9)

    def test_skew_cross_product(self):
        a = RNG.normal(size=(8, 3))
        b = RNG.normal(size=(8, 3))
        got = np.einsum("nij,nj->ni", np.asarray(sp.skew(jnp.asarray(a))), b)
        np.testing.assert_allclose(got, np.cross(a, b), atol=1e-12)


class TestTransforms:
    def test_rt2tr_tr2rt_roundtrip(self):
        R = random_rotations(8).as_matrix()
        t = RNG.normal(size=(8, 3))
        T = sp.rt2tr(jnp.asarray(R), jnp.asarray(t))
        assert T.shape == (8, 4, 4)
        R2, t2 = sp.tr2rt(T)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-12)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-12)
        np.testing.assert_allclose(np.asarray(T)[:, 3], [[0, 0, 0, 1]] * 8, atol=0)

    def test_invt(self):
        R = random_rotations(8).as_matrix()
        t = RNG.normal(size=(8, 3))
        T = sp.rt2tr(jnp.asarray(R), jnp.asarray(t))
        TinvT = np.asarray(sp.invt(T) @ T)
        np.testing.assert_allclose(TinvT, np.tile(np.eye(4), (8, 1, 1)), atol=1e-12)

    def test_standoff(self):
        for axis, idx in [("x", 0), ("y", 1), ("z", 2)]:
            T = np.asarray(sp.standoff(-0.1, axis))
            want = np.eye(4)
            want[idx, 3] = -0.1
            np.testing.assert_allclose(T, want, atol=0)

    def test_transform_points(self):
        R = random_rotations(4).as_matrix()
        t = RNG.normal(size=(4, 3))
        pts = RNG.normal(size=(4, 100, 3))
        T = sp.rt2tr(jnp.asarray(R), jnp.asarray(t))
        got = np.asarray(sp.transform_points(T, jnp.asarray(pts)))
        want = np.einsum("bij,bnj->bni", R, pts) + t[:, None]
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestQuaternions:
    def test_quat2r_r2quat_roundtrip(self):
        rots = random_rotations(64)
        q = rots.as_quat()  # scipy is also xyzw
        R = np.asarray(sp.quat2r(jnp.asarray(q)))
        np.testing.assert_allclose(R, rots.as_matrix(), atol=1e-12)
        q2 = np.asarray(sp.r2quat(jnp.asarray(rots.as_matrix())))
        # sign ambiguity: compare |<q, q2>| ~ 1
        dots = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-9)

    def test_qmul_matches_scipy(self):
        r1, r2 = random_rotations(16), Rotation.random(16, random_state=7)
        got = np.asarray(sp.qmul(jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat())))
        want = (r1 * r2).as_quat()
        dots = np.abs(np.sum(got * want, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-9)

    def test_qangle_deg(self):
        r1 = random_rotations(16)
        angles = RNG.uniform(0.01, np.pi - 0.01, size=16)
        axes = RNG.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        r2 = r1 * Rotation.from_rotvec(angles[:, None] * axes)
        got = np.asarray(sp.qangle_deg(jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat())))
        np.testing.assert_allclose(got, np.degrees(angles), atol=1e-6)

    def test_rotation_angle_identity(self):
        R = random_rotations(8).as_matrix()
        got = np.asarray(sp.rotation_angle_deg(jnp.asarray(R), jnp.asarray(R)))
        np.testing.assert_allclose(got, 0.0, atol=1e-3)


class TestJaxTransforms:
    def test_jit_and_vmap(self):
        import jax

        rpy = jnp.asarray(RNG.uniform(-1, 1, size=(8, 3)))
        f = jax.jit(jax.vmap(sp.rpy2r))
        np.testing.assert_allclose(np.asarray(f(rpy)), np.asarray(sp.rpy2r(rpy)), atol=1e-12)

    def test_grad_flows(self):
        import jax

        def loss(theta):
            return jnp.sum(sp.rotz(theta) @ jnp.ones(3))

        g = jax.grad(loss)(0.3)
        assert np.isfinite(np.asarray(g))
