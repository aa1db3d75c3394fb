"""IK-only screening over the SceneReplica benchmark.

Parity with /root/reference/examples/pybullet_ik_checking.py: per scene x
object, render, build the obstacle field, and report how many grasp
candidates pass the IK screen (pos err < 1 cm, rot err < 5 deg) — no
trajectory optimization or execution. The whole grasp set screens as one
vmapped batch.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from grasptrajopt_tpu.envs import HAS_PYBULLET
from grasptrajopt_tpu.envs.camera import pose_from_position_quaternion
from grasptrajopt_tpu.envs.grasps import load_grasps
from grasptrajopt_tpu.fields import DepthPointCloud
from grasptrajopt_tpu.planning import GTORobotModel, IKSolver
from grasptrajopt_tpu.planning.utils import get_data_dir, load_robot_config


def main():
    if not HAS_PYBULLET:
        print("this driver needs pybullet")
        sys.exit(1)

    from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv

    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-d", "--data_dir", default=None)
    parser.add_argument("-s", "--scene_id", type=int, default=10)
    parser.add_argument("-t", "--scene_type", default="tabletop")
    parser.add_argument("--assets_dir", default=None)
    args = parser.parse_args()

    assets_dir = args.assets_dir or get_data_dir()
    data_dir = args.data_dir or assets_dir
    cfg = load_robot_config(args.robot, assets_dir)
    urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]
    robot = GTORobotModel(
        os.path.join(assets_dir, "robots", cfg["robot_name"]),
        urdf_filename=os.path.join(assets_dir, urdf_rel),
        time_derivs=[0, 1],
        param_joints=cfg["param_joints"],
        collision_link_names=cfg["collision_link_names"],
    )
    env = SceneReplicaEnv(
        os.path.join(assets_dir, urdf_rel), data_dir, assets_dir, args.robot, args.scene_type
    )
    ik_solver = IKSolver(robot, cfg["link_ee"], cfg["link_gripper"], collision_avoidance=False)
    ik_solver.setup_optimization()

    meta = env.setup_scene(args.scene_id)
    ordering = "nearest_first" if args.scene_type == "tabletop" else "random"
    object_order = meta[ordering][0].split(",")
    for object_name in object_order:
        rgba, depth, mask, cam_pose, K = env.get_observation()
        depth_pc = DepthPointCloud(depth, K, cam_pose, threshold=cfg["depth_threshold"])
        robot.setup_points_field(depth_pc.points)
        sdf = np.asarray(depth_pc.build_cost_field(robot.grid))
        ik_solver.setup_optimization(robot.grid)

        RT_grasps = load_grasps(data_dir, args.robot, object_name)
        pos, orn = env.get_object_pose(object_name)
        RT_obj = pose_from_position_quaternion(pos, [orn[3], orn[0], orn[1], orn[2]])
        RT_world = np.einsum("ij,njk->nik", RT_obj, RT_grasps)
        RT_base = RT_world.copy()
        RT_base[:, :3, 3] -= env.base_position

        q0 = np.array(env.robot.q())
        start = time.time()
        q_sols, err_pos, err_rot, _ = ik_solver.solve_ik_batch(q0, RT_base, sdf, env.base_position)
        found = (err_pos < 0.01) & (err_rot < 5.0)
        print(
            f"{object_name}: {found.sum()}/{found.size} grasps have IK "
            f"({time.time() - start:.2f}s batched)"
        )


if __name__ == "__main__":
    main()
