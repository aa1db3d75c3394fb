"""Replay recorded plans in PyBullet and record videos.

Counterpart of the reference's pybullet_save_videos.py: loads a result
JSON, replays each plan in the simulator, and writes one mp4 per
scene/ordering via OpenCV. Gated on pybullet + cv2.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from grasptrajopt_tpu.envs import HAS_PYBULLET
from grasptrajopt_tpu.planning.utils import get_data_dir, load_robot_config
from grasptrajopt_tpu.utils import load_results


def main():
    if not HAS_PYBULLET:
        print("this driver needs pybullet")
        sys.exit(1)
    try:
        import cv2
    except ImportError:
        print("this driver needs opencv-python (cv2) for video writing")
        sys.exit(1)

    import pybullet as p

    from grasptrajopt_tpu.envs.scene_replica import SceneReplicaEnv

    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="panda")
    parser.add_argument("-d", "--data_dir", default=None)
    parser.add_argument("-t", "--scene_type", default="tabletop")
    parser.add_argument("-f", "--file", required=True)
    parser.add_argument("-o", "--outdir", default="videos")
    args = parser.parse_args()

    assets_dir = get_data_dir()
    data_dir = args.data_dir or assets_dir
    cfg = load_robot_config(args.robot, assets_dir)
    urdf_rel = cfg["urdf_robot_path"].split("data/", 1)[-1]
    env = SceneReplicaEnv(
        os.path.join(assets_dir, urdf_rel), data_dir, assets_dir, args.robot, args.scene_type
    )
    results_scene = load_results(args.file)
    os.makedirs(args.outdir, exist_ok=True)

    W, H = env._window_width, env._window_height
    view = p.computeViewMatrixFromYawPitchRoll([0.8, 0, 0.8], 1.8, 15.0, -41.0, 0, 2)
    proj = p.computeProjectionMatrixFOV(60.0, W / H, 0.1, 10)

    for scene_id, orderings in results_scene.items():
        meta = env.setup_scene(int(scene_id))
        for ordering, results in orderings.items():
            if ordering == "RT_base_new":
                continue
            object_order = meta[ordering][0].split(",")
            out = os.path.join(args.outdir, f"scene{scene_id}_{ordering}.mp4")
            writer = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), 25, (W, H))
            set_objects = set(object_order)
            for object_name in object_order:
                rec = results.get(object_name, {})
                env.reset_scene(set_objects)
                if rec.get("plan") is not None:
                    plan = np.asarray(rec["plan"])
                    for t in range(plan.shape[1]):
                        env.robot.cmd(plan[:, t])
                        for _ in range(200):
                            p.stepSimulation()
                        _, _, rgba, _, _ = p.getCameraImage(
                            W, H, viewMatrix=view, projectionMatrix=proj
                        )
                        writer.write(np.asarray(rgba)[:, :, [2, 1, 0]].astype(np.uint8))
                env.reset_objects(object_name)
                env.robot.retract()
                set_objects.remove(object_name)
            writer.release()
            print("wrote", out)


if __name__ == "__main__":
    main()
