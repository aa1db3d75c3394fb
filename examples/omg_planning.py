"""OMG-Planner baseline driver (external dependency).

Parity with /root/reference/examples/pybullet_omg_planning.py:54-208: runs
the external OMG-Planner (CHOMP-style, github.com/liruiw/OMG-Planner) on
the same SceneReplica benchmark for comparison with the GTO pipeline. The
`omg` package is not vendored by the reference either; this driver gates
on its availability and otherwise explains how to produce comparable
baseline numbers (the committed OMG result JSONs re-score via
grasptrajopt_tpu.utils.results).
"""

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from grasptrajopt_tpu.envs import HAS_PYBULLET
from grasptrajopt_tpu.planning.utils import get_data_dir, load_robot_config

try:
    from omg.config import cfg as omg_cfg  # type: ignore
    from omg.core import PlanningScene  # type: ignore

    HAS_OMG = True
except ImportError:
    HAS_OMG = False


def make_args():
    parser = argparse.ArgumentParser(description="OMG baseline on SceneReplica")
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-d", "--data_dir", default=None)
    parser.add_argument("-s", "--scene_id", type=int, default=-1)
    parser.add_argument("-t", "--scene_type", default="tabletop")
    parser.add_argument("--assets_dir", default=None)
    return parser.parse_args()


def main():
    if not HAS_OMG:
        print(
            "the OMG-Planner package is not installed "
            "(https://github.com/liruiw/OMG-Planner). The reference's "
            "committed OMG baselines re-score with:\n"
            "  python -c \"from grasptrajopt_tpu.utils import *; "
            "print(aggregate_results(load_results('<OMG result json>')))\""
        )
        sys.exit(1)
    if not HAS_PYBULLET:
        print("this driver needs pybullet")
        sys.exit(1)

    from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv

    args = make_args()
    assets_dir = args.assets_dir or get_data_dir()
    data_dir = args.data_dir or assets_dir
    cfg = load_robot_config(args.robot, assets_dir)
    urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]

    # OMG configuration mirroring the reference driver (:72-92)
    omg_cfg.traj_init = "grasp"
    omg_cfg.vis = False
    omg_cfg.scene_file = ""
    omg_cfg.ik_parallel = False
    omg_cfg.timesteps = 50
    omg_cfg.get_global_param(omg_cfg.timesteps)

    env = SceneReplicaEnv(
        os.path.join(assets_dir, urdf_rel), data_dir, assets_dir, args.robot, args.scene_type
    )
    scene = PlanningScene(omg_cfg)

    results_scene = {}
    total_success = 0
    all_scene_ids = env.all_scene_ids if args.scene_id == -1 else [args.scene_id]
    for scene_id in all_scene_ids:
        meta = env.setup_scene(scene_id)
        results_ordering = {}
        for ordering in (["nearest_first", "random"] if args.scene_type == "tabletop" else ["random"]):
            object_order = meta[ordering][0].split(",")
            results = {}
            set_objects = set(object_order)
            for object_name in object_order:
                env.reset_scene(set_objects)
                start = time.time()
                scene.env.update(env)  # scene-state sync (driver :120-150)
                info = scene.step()
                planning_time = time.time() - start
                plan = scene.planner.history_trajectories[-1]
                env.execute_plan(np.asarray(plan).T)
                env.robot.close_gripper()
                env.record_gripper_position()
                env.retract(cfg["retract_distance"])
                reward = env.compute_reward(object_name)
                total_success += reward
                env.reset_objects(object_name)
                env.robot.retract()
                set_objects.remove(object_name)
                results[object_name] = {
                    "reward": reward,
                    "plan": np.asarray(plan).T.tolist(),
                    "checking_time": None,
                    "ik_time": None,
                    "planning_time": planning_time,
                }
            results_ordering[ordering] = results
        results_scene[f"{scene_id}"] = results_ordering

    os.makedirs("results", exist_ok=True)
    stamp = "{:%y-%m-%d_T%H%M%S}".format(datetime.datetime.now())
    out = os.path.join("results", f"OMG_scenereplica_{args.robot}_{args.scene_type}_{stamp}.json")
    with open(out, "w") as f:
        json.dump(results_scene, f)
    print("total success", total_success, "->", out)


if __name__ == "__main__":
    main()
