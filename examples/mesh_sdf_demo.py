"""Surface-point sampling + SDF query demo on a robot link mesh.

Counterpart of the reference's test_mesh_to_sdf.py viewer — headless:
samples a link mesh's surface, queries signed distances around it, and
writes a colored scatter PNG (blue = inside, red = outside).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from grasptrajopt_tpu.fields import get_surface_point_cloud
from grasptrajopt_tpu.models.mesh import load_mesh
from grasptrajopt_tpu.planning.utils import get_data_dir
from grasptrajopt_tpu.viz import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-m", "--mesh",
        default=os.path.join(get_data_dir(), "robots", "panda", "meshes", "visual", "hand.obj"),
    )
    parser.add_argument("-o", "--out", default="mesh_sdf.png")
    args = parser.parse_args()

    mesh = load_mesh(args.mesh)
    cloud = get_surface_point_cloud(mesh, "sample", sample_point_count=5000)

    rng = np.random.default_rng(0)
    base = cloud.get_random_surface_points(2000, seed=1)
    queries = np.concatenate(
        [base + rng.normal(scale=0.01, size=base.shape),
         base + rng.normal(scale=0.002, size=base.shape)]
    )
    sdf = cloud.get_sdf(queries)

    vis = Visualizer(camera_position=[0.3, 0.3, 0.3])
    vis.points(queries[sdf < 0], rgb=[0, 0, 1], size=2)
    vis.points(queries[sdf > 0], rgb=[1, 0, 0], size=2)
    vis.save(args.out)
    print(
        f"wrote {args.out}: {len(queries)} queries, "
        f"{(sdf < 0).mean() * 100:.0f}% inside, sdf range "
        f"[{sdf.min():.4f}, {sdf.max():.4f}]"
    )


if __name__ == "__main__":
    main()
