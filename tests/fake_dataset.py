"""Miniature SceneReplica-shaped dataset for fake-backend tests.

Builds the directory layout the drivers expect (grasp_data /
final_scenes/metadata / objects, cf. /root/reference/examples/
pybullet_scenereplica.py:81-112 and pybullet_gto_planning.py:21-44) from
first-party pieces: box "YCB" objects and analytic top-down grasps.
"""

import os

import numpy as np
import scipy.io


def write_box_urdf(path, sx, sy, sz, mass=0.05):
    with open(path, "w") as f:
        f.write(
            f"""<robot name="box">
  <link name="base">
    <visual><geometry><box size="{sx} {sy} {sz}"/></geometry></visual>
    <collision><geometry><box size="{sx} {sy} {sz}"/></geometry></collision>
    <inertial><mass value="{mass}"/><inertia ixx="1e-4" ixy="0" ixz="0" iyy="1e-4" iyz="0" izz="1e-4"/></inertial>
  </link>
</robot>
"""
        )


def top_down_grasp(height: float = 0.10) -> np.ndarray:
    """Object-frame grasp pose: gripper approach (+z of the hand frame)
    pointing straight down, hand origin `height` above the object center."""
    g = np.eye(4)
    g[:3, :3] = np.diag([1.0, -1.0, -1.0])  # rotX(pi): z down
    g[2, 3] = height
    return g


def top_down_grasp_fetch(height: float = 0.30) -> np.ndarray:
    """Fetch wrist_roll-frame grasp: approach axis is +x (fetch.yaml
    axis_standoff 'x'), pointed straight down, wrist `height` above the
    object center (the wrist sits ~0.2 m behind the fingertips)."""
    g = np.eye(4)
    g[:3, :3] = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    g[2, 3] = height
    return g


def _mat_to_quat_xyzw(R):
    import math

    t = np.trace(R)
    s = math.sqrt(max(t + 1.0, 1e-12)) * 2
    return (
        float((R[2, 1] - R[1, 2]) / s),
        float((R[0, 2] - R[2, 0]) / s),
        float((R[1, 0] - R[0, 1]) / s),
        0.25 * s,
    )


def make_mini_dataset(root: str, scene_id: int = 10, grasp: np.ndarray = None):
    """Populate `root` with 16 box YCB objects, panda + fetch grasp files
    and one tabletop scene's metadata. Returns the scene's object names."""
    import json

    from grasptrajopt_tpu.envs.scene_replica import YCB_OBJECT_NAMES

    if grasp is None:
        grasp = top_down_grasp()
    fetch_grasp = top_down_grasp_fetch()
    q_xyzw = _mat_to_quat_xyzw(fetch_grasp[:3, :3])
    fetch_pose = list(fetch_grasp[:3, 3]) + list(q_xyzw)  # [x y z qx qy qz qw]
    os.makedirs(os.path.join(root, "grasp_data", "panda_simulated"), exist_ok=True)
    os.makedirs(os.path.join(root, "grasp_data", "refined_grasps"), exist_ok=True)
    os.makedirs(os.path.join(root, "final_scenes", "metadata"), exist_ok=True)
    for name in YCB_OBJECT_NAMES:
        obj_dir = os.path.join(root, "objects", name)
        os.makedirs(obj_dir, exist_ok=True)
        write_box_urdf(os.path.join(obj_dir, "model_normalized.urdf"), 0.06, 0.06, 0.12)
        np.save(
            os.path.join(root, "grasp_data", "panda_simulated", f"{name}.npy"),
            np.array({"transforms": np.stack([grasp, grasp])}, dtype=object),
        )
        with open(
            os.path.join(root, "grasp_data", "refined_grasps", f"fetch_gripper-{name}.json"),
            "w",
        ) as f:
            json.dump({"grasps": [{"pose": fetch_pose}, {"pose": fetch_pose}]}, f)
    names = ["009_gelatin_box", "010_potted_meat_can"]
    poses = np.zeros((2, 7))
    poses[0] = [0.7, -0.15, 0.82, 1, 0, 0, 0]  # wxyz identity
    poses[1] = [0.7, 0.15, 0.82, 1, 0, 0, 0]
    meta = {
        "object_names": names,
        "nearest_first": [",".join(names)],
        "random": [",".join(reversed(names))],
        "poses": poses,
    }
    scipy.io.savemat(
        os.path.join(root, "final_scenes", "metadata", "meta-%06d.mat" % scene_id), meta
    )
    return names
