"""Render an object's grasp set as gripper ghosts (headless PNG).

Counterpart of the reference's visualize_grasps.py (which, note, imports a
nonexistent `ycb_special_case` helper — a latent bug documented in
SURVEY.md C25). Needs the external SceneReplica grasp_data tree.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.envs.grasps import load_grasps
from grasptrajopt_tpu.planning import GTORobotModel
from grasptrajopt_tpu.planning.utils import get_data_dir, load_robot_config
from grasptrajopt_tpu.spatial import r2quat
from grasptrajopt_tpu.viz import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-d", "--data_dir", default=None, help="SceneReplica dataset root")
    parser.add_argument("-m", "--model", default="003_cracker_box")
    parser.add_argument("-n", "--num", type=int, default=8)
    parser.add_argument("-o", "--out", default="grasps.png")
    args = parser.parse_args()

    assets_dir = get_data_dir()
    data_dir = args.data_dir or assets_dir
    cfg = load_robot_config(args.robot, assets_dir)
    gripper_rel = cfg["urdf_gripper_path"].split("data/", 1)[-1]
    gripper = GTORobotModel(
        os.path.join(assets_dir, "robots", cfg["robot_name"]),
        urdf_filename=os.path.join(assets_dir, gripper_rel),
    )

    RT_grasps = load_grasps(data_dir, args.robot, args.model)
    idx = np.linspace(0, RT_grasps.shape[0] - 1, min(args.num, RT_grasps.shape[0])).astype(int)

    vis = Visualizer(camera_position=[0.5, 0.5, 0.5])
    vis.grid_floor(extent=0.3)
    for RT in RT_grasps[idx]:
        quat = np.asarray(r2quat(jnp.asarray(RT[:3, :3])))
        vis.robot(
            gripper,
            q=cfg["gripper_open_offsets"],
            base_position=RT[:3, 3],
            base_orientation=quat,
            alpha=0.5,
        )
    vis.save(args.out)
    print(f"wrote {args.out}: {len(idx)} of {RT_grasps.shape[0]} grasps for {args.model}")


if __name__ == "__main__":
    main()
