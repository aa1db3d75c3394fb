"""Render a SceneReplica-style scene: furniture, objects, robot at its
default pose, and sample grasps per object as gripper ghosts (headless PNG).

Counterpart of the reference's examples/visualize_scenes.py, which renders
a SceneReplica scene (.mat metadata + textured YCB meshes + refined grasp
sets) in its VTK viewer. The external SceneReplica dataset is not shipped
here, so this driver renders the framework's synthetic SceneReplica-style
scenes (envs/synthetic.py: YCB-dimensioned primitives, analytic antipodal
grasp sets) — the same scene generator the closed-loop evaluation harness
uses — with the robot loaded from the reference data tree.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax.numpy as jnp

from grasptrajopt_tpu.envs.synthetic import SyntheticSceneEnv
from grasptrajopt_tpu.planning import GTORobotModel
from grasptrajopt_tpu.planning.utils import default_pose, get_data_dir, load_robot_config
from grasptrajopt_tpu.spatial import r2quat
from grasptrajopt_tpu.viz import Visualizer


def main():
    parser = argparse.ArgumentParser(description="Visualize a synthetic scene")
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-s", "--scene_id", type=int, default=10)
    parser.add_argument("-t", "--scene_type", default="tabletop", choices=["tabletop", "shelf"])
    parser.add_argument("-n", "--n_objects", type=int, default=5)
    parser.add_argument("-g", "--grasps_per_object", type=int, default=3)
    parser.add_argument("-o", "--out", default="scene.png")
    args = parser.parse_args()

    assets_dir = get_data_dir()
    cfg = load_robot_config(args.robot, assets_dir)
    urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]
    robot = GTORobotModel(
        os.path.join(assets_dir, "robots", cfg["robot_name"]),
        urdf_filename=os.path.join(assets_dir, urdf_rel),
        param_joints=cfg["param_joints"],
        collision_link_names=cfg["collision_link_names"],
        points_per_link=30,
    )
    gripper_rel = cfg["urdf_gripper_path"].split("data/", 1)[-1]
    gripper = GTORobotModel(
        os.path.join(assets_dir, "robots", cfg["robot_name"]),
        urdf_filename=os.path.join(assets_dir, gripper_rel),
    )

    env = SyntheticSceneEnv(
        robot_name=args.robot, scene_type=args.scene_type, n_objects=args.n_objects
    )
    meta = env.setup_scene(args.scene_id)
    rng = np.random.default_rng(args.scene_id)

    vis = Visualizer(camera_position=[1.6, 1.6, 1.5])
    for mesh, pose, _uid in env._static_meshes:
        verts = mesh.vertices @ pose[:3, :3].T + pose[:3, 3]
        vis.mesh(verts, mesh.faces, rgb=(0.55, 0.4, 0.25), alpha=0.35)

    print(f"----------- scene {args.scene_id} ({args.scene_type}) -----------")
    for placed in env.objects:
        mesh = placed.obj.mesh
        verts = mesh.vertices @ placed.pose[:3, :3].T + placed.pose[:3, 3]
        vis.mesh(verts, mesh.faces, rgb=(0.2, 0.5, 0.8), alpha=1.0)
        print(placed.obj.name, placed.pose[:3, 3])

        RT_world = env.grasps_world(placed.obj.name)
        idx = rng.choice(RT_world.shape[0], min(args.grasps_per_object, RT_world.shape[0]), replace=False)
        for RT in RT_world[idx]:
            quat = np.asarray(r2quat(jnp.asarray(RT[:3, :3])))
            vis.robot(
                gripper,
                q=cfg["gripper_open_offsets"],
                base_position=RT[:3, 3],
                base_orientation=quat,
                alpha=0.35,
            )

    vis.robot(robot, q=default_pose(robot), base_position=env.base_position)
    vis.save(args.out)
    print(f"wrote {args.out}: {len(env.objects)} objects ({meta['object_names']})")


if __name__ == "__main__":
    main()
