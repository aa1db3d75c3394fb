"""Render a robot model + its surface point cloud to PNG.

Counterpart of the reference's visualize_robot.py / test_mesh_to_sdf.py
viewers (headless: writes robot.png instead of opening a VTK window).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.planning import GTORobotModel
from grasptrajopt_tpu.planning.utils import default_pose, get_data_dir, load_robot_config
from grasptrajopt_tpu.viz import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-o", "--out", default="robot.png")
    args = parser.parse_args()

    data_dir = get_data_dir()
    cfg = load_robot_config(args.robot, data_dir)
    urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]
    robot = GTORobotModel(
        model_dir=os.path.join(data_dir, "robots", cfg["robot_name"]),
        urdf_filename=os.path.join(data_dir, urdf_rel),
        param_joints=cfg["param_joints"],
        collision_link_names=cfg["collision_link_names"],
    )
    q = default_pose(robot)

    pts, normals = robot.compute_fk_surface_points(jnp.asarray(q))
    vis = Visualizer(camera_position=[3, 0, 3])
    vis.grid_floor()
    vis.points(pts, rgb=[1, 0, 0], size=5)
    vis.robot(robot, q=q, alpha=0.5)
    vis.save(args.out)
    print(f"wrote {args.out}: {robot.name}, {pts.shape[0]} surface points")


if __name__ == "__main__":
    main()
