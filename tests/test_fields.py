"""Tests for mesh IO, surface point clouds, voxel grids, depth point clouds."""

import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.fields import (
    DepthPointCloud,
    OccupancyGrid2D,
    SurfacePointCloud,
    VoxelGrid,
    get_surface_point_cloud,
)
from grasptrajopt_tpu.fields.depth_point_cloud import sdf_cost_shaping
from grasptrajopt_tpu.models.mesh import TriangleMesh, load_mesh, load_obj, load_stl

RNG = np.random.default_rng(0)


def make_cube(half=0.5):
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)]
    )
    faces = []
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # x- x+
        (0, 4, 5, 1), (2, 3, 7, 6),  # y- y+
        (0, 2, 6, 4), (1, 5, 7, 3),  # z- z+
    ]
    for a, b, c, d in quads:
        faces.append([a, b, c])
        faces.append([a, c, d])
    return TriangleMesh(vertices=v.astype(float), faces=np.asarray(faces, dtype=np.int32))


def make_icosphere(radius=1.0, subdiv=3):
    t = (1.0 + 5**0.5) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=float,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(subdiv):
        verts_list = list(verts)
        cache = {}
        new_faces = []

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (verts_list[i] + verts_list[j]) / 2
                m = m / np.linalg.norm(m)
                cache[key] = len(verts_list)
                verts_list.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces)
    return TriangleMesh(vertices=verts * radius, faces=faces.astype(np.int32))


class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path):
        cube = make_cube()
        path = tmp_path / "cube.obj"
        with open(path, "w") as f:
            for v in cube.vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for face in cube.faces:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
        mesh = load_obj(str(path))
        np.testing.assert_allclose(mesh.vertices, cube.vertices)
        np.testing.assert_array_equal(mesh.faces, cube.faces)

    def test_obj_with_texcoords_and_quads(self, tmp_path):
        path = tmp_path / "quad.obj"
        path.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvt 0 0\nvn 0 0 1\n"
            "f 1/1/1 2/1/1 3/1/1 4/1/1\n"
        )
        mesh = load_obj(str(path))
        assert mesh.faces.shape == (2, 3)  # fan-triangulated quad

    def test_stl_binary_roundtrip(self, tmp_path):
        cube = make_cube()
        path = tmp_path / "cube.stl"
        tris = cube.vertices[cube.faces]
        normals = cube.face_normals
        with open(path, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", len(tris)))
            for n, tri in zip(normals, tris):
                f.write(struct.pack("<3f", *n))
                for v in tri:
                    f.write(struct.pack("<3f", *v))
                f.write(struct.pack("<H", 0))
        mesh = load_stl(str(path))
        assert mesh.faces.shape == cube.faces.shape
        np.testing.assert_allclose(
            np.sort(mesh.vertices[mesh.faces].reshape(-1)), np.sort(tris.reshape(-1)), atol=1e-6
        )

    def test_area_weighted_sampling(self):
        cube = make_cube(0.5)
        pts, normals = cube.sample_surface(4000, seed=1)
        assert pts.shape == (4000, 3)
        # all points on the surface: max-|coord| == 0.5
        np.testing.assert_allclose(np.abs(pts).max(axis=1), 0.5, atol=1e-9)
        # roughly uniform over 6 faces
        for axis in range(3):
            for side in (-0.5, 0.5):
                frac = np.mean(np.isclose(pts[:, axis], side))
                assert 0.1 < frac < 0.25
        # normals are unit and axis-aligned for a cube
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-9)

    def test_sampling_deterministic(self):
        cube = make_cube()
        a, _ = cube.sample_surface(100, seed=7)
        b, _ = cube.sample_surface(100, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_reference_robot_meshes_load(self, data_dir):
        obj = load_mesh(f"{data_dir}/robots/panda/meshes/visual/hand.obj")
        assert obj.vertices.shape[0] > 100
        stl = load_mesh(f"{data_dir}/robots/fetch/meshes/l_wheel_link.STL")
        assert stl.faces.shape[0] == 2086  # verified via the binary header

    def test_dae_loader(self, data_dir):
        dae = load_mesh(f"{data_dir}/robots/fetch/meshes/elbow_flex_link.dae")
        assert dae.vertices.shape[0] > 100
        assert dae.faces.shape[0] > 100
        assert dae.faces.max() < dae.vertices.shape[0]
        # plausibly arm-link sized (meters)
        extent = dae.vertices.max(axis=0) - dae.vertices.min(axis=0)
        assert 0.02 < extent.max() < 1.0
        # sampling works on DAE geometry
        pts, normals = dae.sample_surface(200, seed=0)
        assert pts.shape == (200, 3)


class TestSurfacePointCloud:
    def test_sphere_sdf_signs_and_values(self):
        sphere = make_icosphere(radius=1.0, subdiv=3)
        cloud = get_surface_point_cloud(sphere, "sample", sample_point_count=20000, seed=0)
        queries = np.array([[0, 0, 0], [0.5, 0, 0], [0, 0, 1.5], [1.2, 0, 0]])
        sdf = cloud.get_sdf(queries)
        assert sdf[0] < 0 and sdf[1] < 0
        assert sdf[2] > 0 and sdf[3] > 0
        np.testing.assert_allclose(np.abs(sdf), [1.0, 0.5, 0.5, 0.2], atol=0.05)

    def test_scan_method_parity_with_sample(self):
        """Virtual-scan sampling (software z-buffer scans from Fibonacci
        sphere cameras) must agree with area-weighted sampling — and with
        the exact SDF — on a sphere, for both sign methods."""
        sphere = make_icosphere(radius=0.5, subdiv=3)
        cloud = get_surface_point_cloud(sphere, "scan", scan_count=20, scan_resolution=100)
        assert cloud.points.shape[0] > 10_000
        assert cloud.scans is not None and len(cloud.scans) == 20
        radii = np.linalg.norm(cloud.points, axis=1)
        assert radii.min() > 0.49 and radii.max() < 0.505
        # normals point outward
        align = np.einsum("ij,ij->i", cloud.normals, cloud.points / radii[:, None])
        assert (align > 0.9).mean() > 0.99

        q = np.array([[0, 0, 0], [0.25, 0, 0], [0.75, 0, 0], [0, 0, 0.6], [0.4, 0.3, 0.0]])
        exact = np.linalg.norm(q, axis=1) - 0.5
        np.testing.assert_allclose(cloud.get_sdf(q), exact, atol=0.03)
        np.testing.assert_allclose(cloud.get_sdf(q, use_depth_buffer=True), exact, atol=0.03)

    def test_scan_depth_sign_on_box(self):
        from grasptrajopt_tpu.fields import mesh_to_sdf

        q = np.array([[0.0, 0, 0], [0.25, 0, 0], [0.5, 0.5, 0.5]])
        sd = mesh_to_sdf(
            make_cube(), q, surface_point_method="scan", sign_method="depth",
            scan_count=30, scan_resolution=120,
        )
        # cube is [-0.5, 0.5]^3: center inside, edge-adjacent inside, corner on surface
        assert sd[0] < -0.4 and sd[1] < 0 and abs(sd[2]) < 0.05

    def test_get_voxels_shape(self):
        cloud = get_surface_point_cloud(make_icosphere(subdiv=2), "sample", sample_point_count=5000)
        vox = cloud.get_voxels(16)
        assert vox.shape == (16, 16, 16)
        assert vox[0, 0, 0] > 0  # corner far outside
        assert vox[8, 8, 8] < 0  # center inside


class TestVoxelGrid:
    def test_workspace_field_matches_reference_panda(self):
        """Panda: arm_len=1.0, arm_height=0 (data/configs/panda.yaml) gives
        np.arange-based field shape (36, 56, 36) as in gto_models.py:135-152."""
        grid = VoxelGrid.from_workspace(arm_len=1.0, arm_height=0.0)
        want = (
            len(np.arange(-0.4, 1.4, 0.05)),
            len(np.arange(-1.4, 1.4, 0.05)),
            len(np.arange(-0.4, 1.4, 0.05)),
        )
        assert grid.shape == want
        assert grid.size == want[0] * want[1] * want[2]
        np.testing.assert_allclose(grid.origin, [-0.4, -1.4, -0.4], atol=1e-12)

    def test_points_field(self):
        pts = RNG.uniform(-1, 1, size=(500, 3))
        grid = VoxelGrid.from_points(pts)
        gp = grid.grid_points()
        assert gp.shape == (grid.size, 3)
        np.testing.assert_allclose(gp.min(axis=0), pts.min(axis=0) - 0.4, atol=1e-5)

    def test_lookup_modes(self):
        grid = VoxelGrid(origin=(0, 0, 0), shape=(4, 4, 4), resolution=0.5)
        field = jnp.arange(64, dtype=jnp.float64)
        p = jnp.asarray([[0.5, 1.0, 1.5]])  # exactly at corner (1,2,3)
        near = float(grid.lookup(field, p, "nearest")[0])
        tri = float(grid.lookup(field, p, "trilinear")[0])
        want = 3 + 4 * (2 + 4 * 1)
        assert near == want
        np.testing.assert_allclose(tri, want, atol=1e-9)


class TestDepthPointCloud:
    def _flat_wall_scene(self):
        """Camera at origin looking down +z; wall plane at z=1."""
        H = W = 64
        K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
        depth = np.ones((H, W), dtype=np.float32)
        pose = np.eye(4)
        return depth, K, pose

    def test_backprojection(self):
        depth, K, pose = self._flat_wall_scene()
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        pts = pc.points
        assert pts.shape == (64 * 64, 3)
        np.testing.assert_allclose(pts[:, 2], 1.0, atol=1e-6)

    def test_threshold_masks_points(self):
        depth, K, pose = self._flat_wall_scene()
        depth[:32] = 2.0  # beyond threshold=1.5
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        assert pc.points.shape[0] == 32 * 64

    def test_sdf_sign_and_value(self):
        depth, K, pose = self._flat_wall_scene()
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        q = np.array([[0.0, 0.0, 0.5], [0.0, 0.0, 1.3]])
        sdf = np.asarray(pc.get_sdf(jnp.asarray(q)))
        assert sdf[0] > 0  # in front of the wall: outside
        assert sdf[1] < 0  # behind the wall: inside
        np.testing.assert_allclose(np.abs(sdf), [0.5, 0.3], atol=0.02)

    def test_host_kdtree_path_matches_device_path(self):
        """get_sdf's CPU fast path (C++ multithreaded KD-tree,
        native/geomcore.cpp) must agree exactly with the jnp reduction —
        same nearest distances, same visibility sign."""
        from grasptrajopt_tpu import native

        if not native.is_available():
            pytest.skip("native geomcore unavailable")
        depth, K, pose = self._flat_wall_scene()
        depth[10:20, 30:40] = 0.6  # a protrusion for sign variety
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        q = rng.uniform(-0.8, 1.3, size=(5000, 3))
        s_host = np.asarray(pc.get_sdf(q, host=True))
        s_dev = np.asarray(pc.get_sdf(q, host=False))
        np.testing.assert_allclose(s_host, s_dev, atol=1e-10)

    def test_cost_shaping(self):
        eps = 0.02
        d = jnp.asarray([-0.1, 0.0, 0.01, 0.02, 0.5])
        cost = np.asarray(sdf_cost_shaping(d, epsilon=eps))
        np.testing.assert_allclose(cost[0], 0.1 + eps / 2, atol=1e-7)
        np.testing.assert_allclose(cost[1], eps / 2, atol=1e-7)
        np.testing.assert_allclose(cost[2], (0.01 - eps) ** 2 / (2 * eps), atol=1e-7)
        assert cost[3] == 0.0 and cost[4] == 0.0

    def test_build_cost_field(self):
        depth, K, pose = self._flat_wall_scene()
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        grid = VoxelGrid(origin=(-0.2, -0.2, 0.6), shape=(8, 8, 16), resolution=0.05)
        field = np.asarray(pc.build_cost_field(grid))
        assert field.shape == (grid.size,)
        field3 = field.reshape(grid.shape)
        assert (field3[:, :, -1] > 0).all()  # cells behind wall cost > 0
        assert (field3[:, :, 0] == 0).all()  # cells well in front cost 0

    def test_build_two_cost_fields_parity(self):
        """The fused one-program builder (device dedup + shared obstacle
        pass) must match two independent DepthPointCloud.build_cost_field
        calls: exactly at a negligible dedup voxel, and within the dedup
        error bound at the shipped 1 cm."""
        from grasptrajopt_tpu.fields.depth_point_cloud import (
            build_two_cost_fields,
        )

        depth, K, pose = self._flat_wall_scene()
        depth[10:20, 30:40] = 0.8  # a protruding "object"
        tmask = np.zeros_like(depth, bool)
        tmask[10:20, 30:40] = True  # the protrusion is the target
        grid = VoxelGrid(origin=(-0.4, -0.4, 0.4), shape=(12, 12, 16), resolution=0.05)
        gp = jnp.asarray(grid.grid_points(), jnp.float32)

        pc_all = DepthPointCloud(depth, K, pose)
        d_obs_img = np.array(depth, copy=True)
        d_obs_img[tmask] = 1.5
        pc_obs = DepthPointCloud(d_obs_img, K, pose, tmask)
        want_all = np.asarray(pc_all.get_sdf_cost(gp))
        want_obs = np.asarray(pc_obs.get_sdf_cost(gp))

        # (cell ids are 10 bits/axis: voxel must be >= extent/1024, so the
        # "near-exact" case uses 2 mm, not arbitrarily fine)
        for vox, atol in ((0.002, 2.5e-3), (0.01, 0.011)):
            f_all, f_obs, opts, omask = jax.jit(
                lambda d, m: build_two_cost_fields(
                    d, K, pose, m, gp, dedup_voxel=vox,
                    capacity_obstacle=4096, capacity_target=512,
                )
            )(jnp.asarray(depth), jnp.asarray(tmask))
            # dedup only ever OVER-estimates distances -> shaped cost is
            # under-estimated by at most ~the voxel size in d
            np.testing.assert_allclose(np.asarray(f_all), want_all, atol=atol)
            np.testing.assert_allclose(np.asarray(f_obs), want_obs, atol=atol)
        # the deduped obstacle cloud excludes every target pixel
        kept = np.asarray(opts)[np.asarray(omask)]
        tgt_pts = DepthPointCloud(depth, K, pose).points_padded
        tgt_world = np.asarray(tgt_pts).reshape(64, 64, 3)[tmask]
        from scipy.spatial import cKDTree

        d, _ = cKDTree(tgt_world).query(kept)
        assert d.min() > 1e-6

    def test_signed_distance_to_cloud_matches_get_sdf(self):
        from grasptrajopt_tpu.fields.depth_point_cloud import (
            signed_distance_to_cloud,
        )

        depth, K, pose = self._flat_wall_scene()
        pc = DepthPointCloud(depth, K, pose)
        q = np.random.default_rng(0).uniform(-0.5, 1.3, size=(200, 3)).astype(np.float32)
        want = np.asarray(pc.get_sdf(jnp.asarray(q), host=False))
        got = np.asarray(
            signed_distance_to_cloud(
                jnp.asarray(q), pc.points_padded, pc.valid, pc.depth,
                pc.intrinsic_matrix, pc.camera_pose,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fused_multiview(self):
        # two orthogonal wall views: a point occluded in one view but
        # observed free in the other must be OUTSIDE in the fusion; the
        # union cloud supplies distances from both walls
        from grasptrajopt_tpu.fields import FusedDepthPointCloud

        depth, K, pose = self._flat_wall_scene()  # wall at z=1 seen from -z
        v_front = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        # second camera at the side, looking along +x at a wall at x=1
        pose2 = np.eye(4)
        # camera axes in world coords: cam_x -> +y, cam_y -> +z, view -> +x
        pose2[:3, :3] = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        v_side = DepthPointCloud(depth, K, pose2, dtype=jnp.float64)
        fused = FusedDepthPointCloud([v_front, v_side])

        assert fused.points.shape[0] == v_front.points.shape[0] + v_side.points.shape[0]

        # behind the front wall (inside for v_front) but in front of the
        # side wall's free space at x<1: v_side sees it free -> outside
        q = jnp.asarray([[0.0, 0.0, 1.2]])
        assert not bool(np.asarray(v_front.is_outside(q))[0])
        assert bool(np.asarray(fused.is_outside(q))[0])
        assert float(np.asarray(fused.get_sdf(q))[0]) > 0

        # distance uses the UNION: near the side wall the fused sdf is
        # smaller than the front view's
        q2 = jnp.asarray([[0.9, 0.0, 0.5]])
        d_front = float(np.asarray(v_front.get_sdf(q2))[0])
        d_fused = float(np.asarray(fused.get_sdf(q2))[0])
        assert 0 < d_fused < d_front

        # downsampled fused view keeps sign + approximate distance
        small = fused.downsampled(0.02, capacity_step=256)
        d_small = float(np.asarray(small.get_sdf(jnp.asarray(q2, np.float32)))[0])
        assert abs(d_small - d_fused) <= 0.02 * np.sqrt(3) / 2 + 1e-6
        assert bool(np.asarray(small.is_outside(jnp.asarray(q, np.float32)))[0])

    def test_downsampled_view(self):
        # the dense-build accelerator: voxel-deduplicated padded point set,
        # shared depth image (sign test), f32 compute; distances agree with
        # the full cloud to within the dedup voxel's half-diagonal
        depth, K, pose = self._flat_wall_scene()
        pc = DepthPointCloud(depth, K, pose, dtype=jnp.float64)
        voxel = 0.02
        small = pc.downsampled(voxel, capacity_step=256)
        assert small.points_padded.shape[0] % 256 == 0
        n_small = int(np.asarray(small.valid).sum())
        assert 0 < n_small < pc.points.shape[0]

        q = np.array([[0.0, 0.0, 0.5], [0.1, -0.1, 0.9], [0.0, 0.0, 1.3]])
        sd_full = np.asarray(pc.get_sdf(jnp.asarray(q)))
        sd_small = np.asarray(small.get_sdf(jnp.asarray(q, np.float32)))
        np.testing.assert_array_equal(np.sign(sd_full), np.sign(sd_small))
        assert np.abs(np.abs(sd_full) - np.abs(sd_small)).max() <= voxel * np.sqrt(3) / 2 + 1e-6

        grid = VoxelGrid(origin=(-0.2, -0.2, 0.6), shape=(8, 8, 16), resolution=0.05)
        f_full = np.asarray(pc.build_cost_field(grid))
        f_small = np.asarray(small.build_cost_field(grid))
        # shaped costs stay close (band eps=0.02, error <= half-diagonal)
        assert np.abs(f_full - f_small).max() < 0.05
        # far-field zeros are preserved exactly
        assert (f_small.reshape(grid.shape)[:, :, 0] == 0).all()


class TestSdfProgram:
    """The reference's SDFCallback __main__ is the pattern here: random
    field, evaluate f/J/H, check derivatives (gto/sdf_callback.py:186)."""

    def test_value_jac_hess(self):
        import jax.numpy as jnp

        from grasptrajopt_tpu.fields.sdf_program import make_sdf_program, sdf_value_jac_hess

        grid = VoxelGrid(origin=(0, 0, 0), shape=(6, 7, 8), resolution=0.1)
        field = RNG.normal(size=grid.size)
        value_fn, jac_fn, hess_fn = make_sdf_program(grid, field)
        p = jnp.asarray([0.23, 0.31, 0.42])

        # jacobian vs central differences (the reference's own J scheme)
        eps = 1e-6
        J = np.asarray(jac_fn(p))
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            fd = (value_fn(p + dp) - value_fn(p - dp)) / (2 * eps)
            np.testing.assert_allclose(J[k], np.asarray(fd), atol=1e-4)

        H = np.asarray(hess_fn(p))
        np.testing.assert_allclose(H, H.T, atol=1e-9)
        # trilinear interpolant: pure second derivatives vanish in-cell
        np.testing.assert_allclose(np.diag(H), 0.0, atol=1e-6)

        vals, jacs, hessians = sdf_value_jac_hess(grid, field, np.tile(np.asarray(p), (4, 1)))
        assert vals.shape == (4,) and jacs.shape == (4, 3) and hessians.shape == (4, 3, 3)


class TestOccupancyGrid:
    def test_occupancy(self):
        pts = np.array([[1.0, 0.0, 0.5], [2.0, 1.0, 0.5]])
        grid = OccupancyGrid2D.from_points_bounds(pts[:, :2])
        gp = grid.grid_points()
        from grasptrajopt_tpu.ops import min_sqdist

        d2, _ = min_sqdist(jnp.asarray(np.c_[gp, np.zeros(len(gp))]), jnp.asarray(np.c_[pts[:, :2], np.zeros(2)]))
        # epsilon > cell diagonal so the cell holding each point is occupied
        # (the reference's eps=0.02 < resolution marks only near-corner cells,
        # gto_models.py:219-244 — same floor/arange semantics here)
        occ = (np.sqrt(np.asarray(d2)) < 0.08).astype(float)
        off = np.asarray(grid.offsets(jnp.asarray(pts[:, :2])))
        assert occ[off].sum() == 2
