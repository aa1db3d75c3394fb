"""Software depth camera (z-buffer rasterizer): native/numpy parity,
analytic depth values, and backprojection round-trip."""

import numpy as np

from grasptrajopt_tpu.envs.camera import intrinsics_fov
from grasptrajopt_tpu.envs.render import (
    _rasterize_numpy,
    look_at_pose,
    render_depth,
)
from grasptrajopt_tpu.models.mesh import box_mesh, sphere_mesh


def overhead_camera(height=2.0, w=128, h=128, fov=45.0):
    cam = look_at_pose([0.0, 0.0, height], [0.0, 0.0, 0.0])
    K = intrinsics_fov(fov, w, h)
    return cam, K


class TestRasterizer:
    def test_box_depth_analytic(self):
        mesh = box_mesh([0.4, 0.4, 0.4])
        cam, K = overhead_camera()
        depth, ids = render_depth([(mesh, np.eye(4), 7)], cam, K, 128, 128)
        # top face of the box is at z=0.2 -> depth 1.8 at the image center
        np.testing.assert_allclose(depth[64, 64], 1.8, atol=1e-5)
        assert ids[64, 64] == 7
        assert depth[0, 0] == 0.0 and ids[0, 0] == -1

    def test_z_buffer_ordering_and_ids(self):
        box = box_mesh([0.4, 0.4, 0.4])
        sp = sphere_mesh(0.1)
        above = np.eye(4)
        above[:3, 3] = [0.0, 0.0, 0.4]  # sphere hovering over the box center
        cam, K = overhead_camera()
        depth, ids = render_depth([(box, np.eye(4), 1), (sp, above, 2)], cam, K, 128, 128)
        assert ids[64, 64] == 2  # sphere occludes the box
        np.testing.assert_allclose(depth[64, 64], 2.0 - 0.5, atol=2e-3)
        assert (ids == 1).sum() > 0 and (ids == 2).sum() > 0

    def test_native_numpy_parity(self):
        from grasptrajopt_tpu import native

        mesh = sphere_mesh(0.3, subdiv=2)
        cam, K = overhead_camera()
        R, t = cam[:3, :3], cam[:3, 3]
        verts_cam = (mesh.vertices - t) @ R

        d_np = np.full((96, 96), np.float32(np.inf))
        i_np = np.full((96, 96), -1, np.int32)
        f_np = np.full((96, 96), -1, np.int32)
        _rasterize_numpy(
            verts_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2],
            96, 96, 3, d_np, i_np, f_np,
        )

        if not native.is_available():
            return
        d_cc = np.full((96, 96), np.float32(np.inf))
        i_cc = np.full((96, 96), -1, np.int32)
        f_cc = np.full((96, 96), -1, np.int32)
        assert native.rasterize_native(
            verts_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2],
            96, 96, 3, d_cc, i_cc, f_cc,
        )
        finite = np.isfinite(d_np)
        assert (finite == np.isfinite(d_cc)).all()
        np.testing.assert_allclose(d_np[finite], d_cc[finite], rtol=1e-6)
        assert (i_np == i_cc).all()
        assert (f_np == f_cc).all()

    def test_backprojection_round_trip(self):
        from grasptrajopt_tpu.fields.depth_point_cloud import DepthPointCloud

        mesh = box_mesh([0.4, 0.4, 0.4])
        cam, K = overhead_camera()
        depth, _ = render_depth([(mesh, np.eye(4), 0)], cam, K, 128, 128)
        dpc = DepthPointCloud(depth, K, cam, threshold=1.9)
        pts = dpc.points
        assert pts.shape[0] > 500
        np.testing.assert_allclose(pts[:, 2], 0.2, atol=1e-4)
        assert np.abs(pts[:, :2]).max() <= 0.2 + 1e-3

    def test_look_at_pose_axes(self):
        pose = look_at_pose([1.0, 2.0, 3.0], [1.0, 2.0, 0.0])
        np.testing.assert_allclose(pose[:3, 2], [0, 0, -1], atol=1e-12)  # fwd
        np.testing.assert_allclose(pose[:3, 3], [1, 2, 3])
        # orthonormal
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
