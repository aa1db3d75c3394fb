"""Native geomcore tests: build, mesh-loader parity with the Python
loaders, KD-tree parity with scipy."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from grasptrajopt_tpu import native
from grasptrajopt_tpu.models.mesh import load_mesh


@pytest.fixture(scope="module")
def geomcore():
    if not native.is_available():
        pytest.skip("g++ unavailable or native build failed")
    return native


class TestNativeMeshIO:
    def test_obj_matches_python_loader(self, geomcore, data_dir):
        path = f"{data_dir}/robots/panda/meshes/visual/hand.obj"
        py_mesh = load_mesh(path)
        nat = geomcore.load_mesh_native(path)
        assert nat is not None
        v, f = nat
        np.testing.assert_allclose(v, py_mesh.vertices, atol=1e-12)
        np.testing.assert_array_equal(f, py_mesh.faces)

    def test_stl_matches_python_loader(self, geomcore, data_dir):
        path = f"{data_dir}/robots/fetch/meshes/l_wheel_link.STL"
        py_mesh = load_mesh(path)
        # native dispatches on lowercase extension
        import shutil, tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p2 = os.path.join(d, "wheel.stl")
            shutil.copy(path, p2)
            nat = geomcore.load_mesh_native(p2)
        assert nat is not None
        v, f = nat
        np.testing.assert_allclose(v, py_mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(f, py_mesh.faces)


class TestNativeKDTree:
    def test_matches_scipy(self, geomcore):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(2000, 3))
        queries = rng.normal(size=(500, 3))
        tree = geomcore.NativeKDTree(pts)
        d, i = tree.query(queries)
        want_d, want_i = cKDTree(pts).query(queries)
        np.testing.assert_allclose(d, want_d, atol=1e-12)
        np.testing.assert_array_equal(i, want_i)

    def test_exact_hits(self, geomcore):
        pts = np.array([[0.0, 0, 0], [1, 1, 1], [2, 0, 1]])
        tree = geomcore.NativeKDTree(pts)
        d, i = tree.query(pts)
        np.testing.assert_allclose(d, 0.0, atol=1e-15)
        np.testing.assert_array_equal(i, [0, 1, 2])
